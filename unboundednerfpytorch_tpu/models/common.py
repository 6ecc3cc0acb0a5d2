"""Shared model-layer pieces: render result container, view-dir embedding,
density activation, and the act_shift initializer.

All models share the reference's duck-typed contract
(``forward(rays_o, rays_d, viewdirs, ...) -> dict`` — SURVEY.md §1 L5), here a
NamedTuple with fixed-shape [N_rays, N_samples] fields plus a live-sample
mask instead of flattened ray_id segments.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class RenderResult(NamedTuple):
    """Fixed-shape volume-rendering output.

    Mirrors the reference ret_dict (dvgo.py:407-416, FourierGrid_model.py:650-671)
    with [N, S] tensors + mask in place of flattened [M] segments.
    """

    rgb_marched: jnp.ndarray  # [N, 3]
    alphainv_last: jnp.ndarray  # [N]
    weights: jnp.ndarray  # [N, S] (masked)
    raw_alpha: jnp.ndarray  # [N, S]
    raw_rgb: jnp.ndarray  # [N, S, 3]
    raw_density: jnp.ndarray  # [N, S]
    mask: jnp.ndarray  # [N, S] live-sample mask after all thresholds
    t: jnp.ndarray  # [N, S] ray parameter
    s: jnp.ndarray  # [N, S] normalized distance (1 - 1/(1+t)); == t for bounded
    depth: jnp.ndarray  # [N]
    n_max: int  # static sample count (for distortion interval)
    # dcvgo extra: per-ray weight mass inside the foreground region
    # (dcvgo.py:354-358); None for other families
    wsum_mid: jnp.ndarray | None = None
    # two-stage render only: fraction of rays whose weights-threshold
    # survivors overflowed color_budget (their tail weights were dropped) —
    # makes the truncation observable instead of silent. None elsewhere.
    color_overflow_frac: jnp.ndarray | None = None
    # two-stage render only: raw_rgb above is COMPACTED [N, color_budget, 3]
    # and pairs with the compacted weights, NOT the full [N, S] `weights`
    # field — training losses (rgbper) must not consume it. True marks that
    # render-only layout so the train step can assert against it.
    rgb_compacted: bool = False


def act_shift_from_alpha_init(alpha_init: float) -> float:
    """softplus bias b with 1-exp(-softplus(b)) == alpha_init
    (dvgo.py:47-50: log(1/(1-alpha_init) - 1))."""
    return float(math.log(1.0 / (1.0 - alpha_init) - 1.0))


def viewdir_embedding(viewdirs: jnp.ndarray, viewbase_pe: int) -> jnp.ndarray:
    """(v, sin 2^k v, cos 2^k v) embedding of unit view directions
    (dvgo.py:391-393). [N,3] -> [N, 3+3*2*viewbase_pe]."""
    freqs = 2.0 ** jnp.arange(viewbase_pe, dtype=viewdirs.dtype)
    emb = (viewdirs[..., None] * freqs).reshape(*viewdirs.shape[:-1], -1)
    return jnp.concatenate([viewdirs, jnp.sin(emb), jnp.cos(emb)], axis=-1)


def composite(
    weights: jnp.ndarray,
    rgb: jnp.ndarray,
    alphainv_last: jnp.ndarray,
    bg: jnp.ndarray | float,
) -> jnp.ndarray:
    """rgb_marched = Σ_s w·rgb + T_last·bg over the fixed sample axis —
    the segment_coo reduction (dvgo.py:401-406) as a plain masked sum."""
    acc = jnp.einsum("ns,nsc->nc", weights, rgb)
    return acc + alphainv_last[:, None] * bg
