"""Density→alpha activation and the transmittance scan.

TPU-native replacements for the ``render_utils_cuda`` kernels
``raw2alpha`` (reference ``cuda/render_utils_kernel.cu:430-443``) and
``alpha2weight`` (``:576-651``). The reference operates on flattened
variable-length per-ray segments with a sequential early-exit scan; here rays
are fixed-shape ``[N_rays, N_samples]`` with validity masks, so the scan is a
per-ray cumulative product that XLA vectorizes across the ray axis — no
dynamic shapes, no segment bookkeeping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference scan stops marching a ray once transmittance drops below this
# (render_utils_kernel.cu:597-600). We emulate it exactly with masking.
EARLY_EXIT_T = 1e-3


def raw2alpha(density: jnp.ndarray, shift, interval) -> jnp.ndarray:
    """alpha = 1 - (1 + exp(density + shift))^(-interval).

    Identical to the reference post-activation
    (1 - exp(-softplus(density+shift) * interval)); computed via a numerically
    stable softplus. ``interval`` may be a scalar (uniform step) or per-sample
    (the ``raw2alpha_nonuni`` variant, cu:445-458).
    """
    softplus = jax.nn.softplus(density + shift)
    return 1.0 - jnp.exp(-softplus * interval)


def alpha2weights(
    alpha: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    early_exit_thres: float = EARLY_EXIT_T,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray transmittance scan: w_i = T_i * alpha_i, T_{i+1} = T_i (1-alpha_i).

    Args:
      alpha: [..., N_samples] per-sample opacity, ordered near→far.
      mask: optional [..., N_samples] bool; False samples are treated as empty
        space (alpha := 0). This subsumes the reference's out-of-bbox /
        maskcache / fast_color_thres compactions.
      early_exit_thres: rays stop contributing once the running transmittance
        entering a sample is below this (weight for the sample that crosses
        the threshold IS still emitted, matching the CUDA loop order).
        Set to 0 to disable.

    Returns:
      weights: [..., N_samples]; alphainv_last: [...] = final transmittance
      (background weight).
    """
    if mask is not None:
        alpha = jnp.where(mask, alpha, 0.0)

    one_minus = 1.0 - alpha
    # T entering sample i: exclusive cumprod along the sample axis.
    t_incl = jnp.cumprod(one_minus, axis=-1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )

    if early_exit_thres > 0.0:
        # The CUDA kernel emits w_i = T*alpha_i and THEN breaks when the
        # updated T drops below the threshold, so sample i is processed iff
        # the transmittance entering it is still >= thres (T is monotone).
        processed = t_excl >= early_exit_thres
        weights = t_excl * alpha * processed.astype(alpha.dtype)
        # alphainv_last = T at loop exit = T entering the first unprocessed
        # sample (== t_incl of the last processed one), or the full product.
        any_stop = jnp.any(~processed, axis=-1)
        first_stop = jnp.argmax(~processed, axis=-1)
        t_at_stop = jnp.take_along_axis(t_excl, first_stop[..., None], axis=-1)[..., 0]
        alphainv_last = jnp.where(any_stop, t_at_stop, t_incl[..., -1])
    else:
        weights = t_excl * alpha
        alphainv_last = t_incl[..., -1]

    return weights, alphainv_last


def alpha2weights_flat(
    alpha: jnp.ndarray, ray_id: jnp.ndarray, n_rays: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flattened-segment variant matching the reference call signature.

    For code paths that carry flattened [M] samples with a ray_id map
    (sorted, contiguous segments). Uses a segment-aware scan; prefer the
    fixed-shape :func:`alpha2weights` on TPU.
    """
    m = alpha.shape[0]
    # Segment-exclusive cumprod of (1 - alpha) via log-space cumsum rebased at
    # each segment start: excl_i = cum_{i-1} - cum_{start(r)-1}.
    log1m = jnp.log(jnp.clip(1.0 - alpha, 1e-10, None))
    cum = jnp.cumsum(log1m)
    prev = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    first_idx = jax.ops.segment_min(
        jnp.arange(m), ray_id, num_segments=n_rays
    )  # index of each segment's first element (segments are contiguous)
    base = prev[jnp.clip(first_idx, 0, m - 1)]
    t_excl = jnp.exp(prev - base[ray_id])
    t_incl = jnp.exp(cum - base[ray_id])

    processed = t_excl >= EARLY_EXIT_T
    weights = t_excl * alpha * processed.astype(alpha.dtype)
    # alphainv_last = T at loop exit = min inclusive-T over processed samples
    # (T is monotone decreasing; unprocessed samples never update T).
    t_masked = jnp.where(processed, t_incl, jnp.inf)
    alphainv_last = jax.ops.segment_min(t_masked, ray_id, num_segments=n_rays)
    empty = jax.ops.segment_sum(jnp.ones_like(alpha), ray_id, num_segments=n_rays) == 0
    alphainv_last = jnp.where(
        empty | ~jnp.isfinite(alphainv_last), 1.0, alphainv_last
    )
    return weights, alphainv_last
