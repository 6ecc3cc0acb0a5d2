"""Trilinear voxel-grid interpolation (TPU-native).

Semantics match PyTorch ``F.grid_sample(grid, coords, mode='bilinear',
align_corners=True, padding_mode='zeros')`` as used by the reference DenseGrid
(``/root/reference/FourierGrid/grid.py:50-61``): the query coordinate is
normalized to [-1, 1] per axis and a corner voxel contributes only when its
integer index lies inside the grid (out-of-bounds corners contribute zero).

Unlike the reference ([1, C, X, Y, Z] torch layout with a zyx coordinate
flip), grids here are stored channel-last ``[X, Y, Z, C]`` so a point gathers
8 contiguous C-vectors — the layout the TPU wants (last dim lanes; the
weighted corner combine becomes one [N,8]x[N,8,C] contraction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trilerp_corners(xyz01: jnp.ndarray, dims: tuple):
    """Corner indices + weights for trilinear interpolation.

    xyz01 [..., 3] in [0, 1] (align_corners=True mapping), dims (X, Y, Z).
    Returns (flat_idx [..., 8] int32 clamped in-range,
             w [..., 8] float with out-of-bounds corners zero-weighted).
    """
    X, Y, Z = dims
    c = xyz01 * (jnp.asarray([X, Y, Z], xyz01.dtype) - 1)
    c0 = jnp.floor(c)
    f = c - c0
    c0i = c0.astype(jnp.int32)

    idx_list, w_list = [], []
    for dx in (0, 1):
        xi = c0i[..., 0] + dx
        wx = f[..., 0] if dx else 1.0 - f[..., 0]
        vx = (xi >= 0) & (xi < X)
        for dy in (0, 1):
            yi = c0i[..., 1] + dy
            wy = f[..., 1] if dy else 1.0 - f[..., 1]
            vy = (yi >= 0) & (yi < Y)
            for dz in (0, 1):
                zi = c0i[..., 2] + dz
                wz = f[..., 2] if dz else 1.0 - f[..., 2]
                vz = (zi >= 0) & (zi < Z)
                w = wx * wy * wz * (vx & vy & vz).astype(xyz01.dtype)
                flat = (
                    jnp.clip(xi, 0, X - 1) * (Y * Z)
                    + jnp.clip(yi, 0, Y - 1) * Z
                    + jnp.clip(zi, 0, Z - 1)
                )
                idx_list.append(flat)
                w_list.append(w)
    return jnp.stack(idx_list, -1), jnp.stack(w_list, -1)


def gather_trilerp(
    flat_grid: jnp.ndarray, flat_idx: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Weighted 8-corner gather: out[...] = Σ_k w_k · flat_grid[idx_k].

    Corner-by-corner takes (8 ops) rather than one [..., 8, C] mega-take:
    TPU pads the channel axis to the 128-lane tile, so materializing all
    corner rows at once blows memory 128/C-fold, while the gather cost is
    dominated by the per-row marginal rate (not per-op overhead).
    """
    out_dtype = jnp.promote_types(flat_grid.dtype, jnp.float32)
    out = None
    for k in range(flat_idx.shape[-1]):
        rows = jnp.take(flat_grid, flat_idx[..., k], axis=0, mode="clip")
        contrib = rows.astype(out_dtype) * w[..., k : k + 1].astype(out_dtype)
        out = contrib if out is None else out + contrib
    return out


def grid_sample_3d(grid: jnp.ndarray, xyz01: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly sample a dense voxel grid.

    Args:
      grid: [X, Y, Z, C] voxel grid (channel-last).
      xyz01: [..., 3] query coordinates normalized to [0, 1] per axis
        (0 maps to voxel 0, 1 maps to voxel dim-1; align_corners=True).
        Out-of-range coordinates receive zero contribution from corners
        that fall outside the grid (torch zeros padding).

    Returns:
      [..., C] interpolated values.
    """
    X, Y, Z, C = grid.shape
    idx, w = trilerp_corners(xyz01, (X, Y, Z))
    return gather_trilerp(grid.reshape(X * Y * Z, C), idx, w)


def grid_sample_2d(plane: jnp.ndarray, xy01: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample a 2D plane [H, W, C] at xy01 [..., 2] in [0, 1].

    xy01[..., 0] indexes H, xy01[..., 1] indexes W (align_corners=True,
    zeros padding). Used by the TensoRF vector-matrix grid
    (reference ``grid.py:176-201``).
    """
    H, W, C = plane.shape
    batch_shape = xy01.shape[:-1]
    pts = xy01.reshape(-1, 2)

    ch = pts[:, 0] * (H - 1)
    cw = pts[:, 1] * (W - 1)
    h0 = jnp.floor(ch)
    w0 = jnp.floor(cw)
    fh = ch - h0
    fw = cw - w0
    h0i = h0.astype(jnp.int32)
    w0i = w0.astype(jnp.int32)

    flat = plane.reshape(H * W, C)
    out = jnp.zeros((pts.shape[0], C), dtype=plane.dtype)
    for dh in (0, 1):
        wh = jnp.where(dh == 0, 1.0 - fh, fh)
        hi = h0i + dh
        vh = (hi >= 0) & (hi < H)
        for dw in (0, 1):
            ww = jnp.where(dw == 0, 1.0 - fw, fw)
            wi = w0i + dw
            vw = (wi >= 0) & (wi < W)
            w = (wh * ww) * (vh & vw).astype(plane.dtype)
            flat_idx = jnp.clip(hi, 0, H - 1) * W + jnp.clip(wi, 0, W - 1)
            out = out + jnp.take(flat, flat_idx, axis=0) * w[:, None]
    return out.reshape(*batch_shape, C)


def resize_grid_3d(grid: jnp.ndarray, new_size: tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear resize of [X, Y, Z, C] to new spatial size (align_corners=True).

    Matches torch ``F.interpolate(mode='trilinear', align_corners=True)`` used
    by ``scale_volume_grid`` (reference ``grid.py:63-68``): output voxel i maps
    to input coordinate i * (in-1)/(out-1).
    """
    out = grid
    for axis, n_new in enumerate(new_size):
        n_old = out.shape[axis]
        if n_new == n_old:
            continue
        if n_new == 1 or n_old == 1:
            idx0 = jnp.zeros((n_new,), jnp.int32)
            out = jnp.take(out, idx0, axis=axis)
            continue
        pos = jnp.arange(n_new, dtype=jnp.float32) * ((n_old - 1) / (n_new - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_old - 2)
        frac = pos - lo.astype(jnp.float32)
        lo_v = jnp.take(out, lo, axis=axis)
        hi_v = jnp.take(out, lo + 1, axis=axis)
        shape = [1] * out.ndim
        shape[axis] = n_new
        f = frac.reshape(shape)
        out = lo_v * (1.0 - f) + hi_v * f
    return out


def max_pool_3d_same(vol: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """3x3x3 max pool, stride 1, 'same' padding over [X, Y, Z].

    Matches ``F.max_pool3d(kernel_size=3, padding=1, stride=1)`` used when
    refreshing the occupancy cache (reference ``dvgo.py:238-245``).
    """
    pad = window // 2
    return jax.lax.reduce_window(
        vol,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(window,) * 3,
        window_strides=(1, 1, 1),
        padding=((pad, pad),) * 3,
    )
