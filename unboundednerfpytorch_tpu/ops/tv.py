"""Total-variation gradient injection.

Replaces ``total_variation_cuda.total_variation_add_grad``
(``/root/reference/FourierGrid/cuda/total_variation_kernel.cu:13-68``): a
clamped (±1) 6-neighbor TV gradient added directly to the parameter gradient
between backward and the optimizer step — TV is never part of the loss value.

Reference-parity notes:
  * weights are divided by 6 inside the op (cu:45-47);
  * ``dense_mode=False`` only touches voxels whose existing grad is nonzero;
  * the CUDA kernel applies ``wz`` (not ``wx``) to the i-axis — a reference
    quirk that is invisible in practice because every call site passes
    wx == wy == wz (``grid.py:70-73``). We implement the per-axis weights
    correctly (wx→x, wy→y, wz→z).

Grids here are channel-last [X, Y, Z, C] (spatial axes 0..2); the reference
layout is [1, C, X, Y, Z]. The math is per-channel and identical.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_tv_grad(param: jnp.ndarray, axis: int, w: float) -> jnp.ndarray:
    """Directional TV grad along one axis: for interior pairs (i, i+1),
    grad[i] += w*clamp(p[i]-p[i+1]); grad[i+1] += w*clamp(p[i+1]-p[i])."""
    n = param.shape[axis]
    if n < 2:
        return jnp.zeros_like(param)
    lo = jnp.take(param, jnp.arange(0, n - 1), axis=axis)
    hi = jnp.take(param, jnp.arange(1, n), axis=axis)
    diff = jnp.clip(lo - hi, -1.0, 1.0)  # antisymmetric, so clamp(hi-lo) = -diff

    pad_widths = [(0, 0)] * param.ndim
    pad_lo = list(pad_widths)
    pad_lo[axis] = (0, 1)
    pad_hi = list(pad_widths)
    pad_hi[axis] = (1, 0)
    return w * (jnp.pad(diff, pad_lo) - jnp.pad(diff, pad_hi))


def total_variation_grad(
    param: jnp.ndarray,
    wx: float,
    wy: float,
    wz: float,
    dense_mode: bool,
    existing_grad: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Compute the TV gradient to add to ``existing_grad``.

    param: [..., X, Y, Z, C] (TV over the 3 axes before the channel axis; any
    leading axes — e.g. FourierGrid banks — are independent).
    When ``dense_mode`` is False, only positions where ``existing_grad != 0``
    receive TV grad (the reference's sparse mode).
    """
    sx, sy, sz = param.ndim - 4, param.ndim - 3, param.ndim - 2
    g = (
        _axis_tv_grad(param, sx, wx / 6.0)
        + _axis_tv_grad(param, sy, wy / 6.0)
        + _axis_tv_grad(param, sz, wz / 6.0)
    )
    if not dense_mode:
        if existing_grad is None:
            raise ValueError("dense_mode=False requires the existing grad")
        g = jnp.where(existing_grad != 0, g, 0.0)
    return g


def total_variation_add_grad(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    wx: float,
    wy: float,
    wz: float,
    dense_mode: bool,
) -> jnp.ndarray:
    """Functional form of the in-place CUDA op: returns grad + tv_grad."""
    return grad + total_variation_grad(
        param, wx, wy, wz, dense_mode, existing_grad=grad
    )
