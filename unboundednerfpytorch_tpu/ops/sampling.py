"""Ray sampling: bounded AABB marching, contracted unbounded sampling, NDC.

TPU-native replacements for the ``render_utils_cuda`` sampling kernels
(``/root/reference/FourierGrid/cuda/render_utils_kernel.cu:11-293``) and the
model-level sampling recipes (``dvgo.py:306-328``, ``dcvgo.py:228-262``,
``FourierGrid_model.py:509-552``, ``dmpigo.py:224-249``).

The CUDA versions emit variable-length flattened point lists; everything here
is **fixed shape** ``[N_rays, N_samples, 3]`` with validity masks, the shape
XLA can tile. A masked sample behaves as empty space downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RaySamples(NamedTuple):
    """Fixed-shape ray-march samples.

    pts:   [N, S, 3] world-space (or contracted-space) sample positions.
    mask:  [N, S] bool — True where the sample is live (inside bbox / within
           the per-ray marching extent).
    t:     [N, S] or [S] distance parameter along the ray.
    """

    pts: jnp.ndarray
    mask: jnp.ndarray
    t: jnp.ndarray


def ray_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    near: float,
    far: float = 1e9,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test: per-ray [t_min, t_max] clamped to [near, far].

    Matches ``infer_t_minmax`` (render_utils_kernel.cu:11-35) including the
    d==0 -> 1e-6 guard and clamp order.
    """
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(-1), near, far)
    t_max = jnp.clip(jnp.maximum(rate_a, rate_b).min(-1), near, far)
    return t_min, t_max


def n_samples_cap(world_size, stepsize: float) -> int:
    """Static sample-count bound: the grid diagonal in marching steps.

    The reference uses this bound for its dense per-view count pass
    (``dvgo.py:250-253``); we use it as the fixed S so every ray's true
    variable count fits.
    """
    import numpy as np

    return int(np.linalg.norm(np.asarray(world_size, dtype=np.float64) + 1) / stepsize) + 1


def sample_pts_on_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    near: float,
    stepdist: float,
    n_samples: int,
    far: float = 1e9,
) -> RaySamples:
    """Bounded-scene equidistant marching (dvgo-style), fixed shape.

    Reference semantics (``sample_pts_on_rays_cuda``): enter the bbox at
    t_min, step by ``stepdist`` along the *normalized* direction, take
    ceil((t_max-t_min)·‖d‖/stepdist) (>=1) steps; points outside the bbox are
    flagged. Here every ray gets ``n_samples`` slots; slots beyond the per-ray
    count or outside the bbox are masked off.
    """
    t_min, t_max = ray_aabb(rays_o, rays_d, xyz_min, xyz_max, near, far)
    # guard degenerate (zero) directions so padded/invalid rays stay finite
    d_norm = jnp.maximum(jnp.linalg.norm(rays_d, axis=-1), 1e-12)
    n_steps = jnp.maximum(jnp.ceil((t_max - t_min) * d_norm / stepdist), 1.0)

    start = rays_o + rays_d * t_min[:, None]
    dirn = rays_d / d_norm[:, None]

    step = jnp.arange(n_samples, dtype=rays_o.dtype)
    dist = stepdist * step  # [S]
    pts = start[:, None, :] + dirn[:, None, :] * dist[None, :, None]

    in_range = step[None, :] < n_steps[:, None]
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    # t along the original (unnormalized) parameterization, handy for depth.
    t = t_min[:, None] + dist[None, :] / jnp.maximum(d_norm[:, None], 1e-12)
    return RaySamples(pts=pts, mask=in_range & in_bbox, t=t)


def sample_ndc_pts_on_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    n_samples: int,
) -> RaySamples:
    """Fixed-N equidistant NDC sampling for the MPI model.

    Matches ``sample_ndc_pts_on_rays_cuda`` (:244-293): points at
    o + d * i/(N-1), with an out-of-bbox flag.
    """
    dist = jnp.arange(n_samples, dtype=rays_o.dtype) / (n_samples - 1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * dist[None, :, None]
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    return RaySamples(pts=pts, mask=in_bbox, t=jnp.broadcast_to(dist, in_bbox.shape))


def contracted_t_values(
    n_inner: int,
    n_outer: int,
    t_boundary: float = 1.5,
    outer_ratio: float = 1.0 / 128.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Bin-center t values for inner linspace + outer 1/s sampling.

    Matches ``FourierGridModel.sample_ray`` (FourierGrid_model.py:524-532):
    inner bins linspace(0, t_boundary, N_inner+1), outer bins
    t_boundary / linspace(1, outer_ratio, N_outer+1); samples at bin centers.
    """
    b_inner = jnp.linspace(0.0, t_boundary, n_inner + 1, dtype=dtype)
    b_outer = t_boundary / jnp.linspace(1.0, outer_ratio, n_outer + 1, dtype=dtype)
    return jnp.concatenate(
        [
            (b_inner[1:] + b_inner[:-1]) * 0.5,
            (b_outer[1:] + b_outer[:-1]) * 0.5,
        ]
    )


def contract(
    pts: jnp.ndarray,
    bg_len: float,
    norm_type: str = "inf",
    boundary: float = 1.0,
    order: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unbounded→cube contraction (FourierGrid_model.py:534-548).

    Points with ||p|| <= boundary stay; beyond, p -> p/||p|| * (B - A/||p||^k)
    with B = 1+bg_len, A = B·b^k − b^(k+1), mapping (boundary, inf) into
    (boundary, 1+bg_len). Returns (contracted points, inner mask).
    """
    if norm_type == "inf":
        norm = jnp.abs(pts).max(axis=-1, keepdims=True)
    elif norm_type == "l2":
        norm = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    else:
        raise NotImplementedError(f"unknown contracted_norm {norm_type!r}")
    B = 1.0 + bg_len
    A = B * (boundary**order) - boundary ** (order + 1)
    inner = norm <= boundary
    safe_norm = jnp.maximum(norm, 1e-10)
    contracted = jnp.where(
        inner, pts, pts / safe_norm * (B - A / (safe_norm**order))
    )
    return contracted, inner[..., 0]


def sample_ray_contracted(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    scene_center: jnp.ndarray,
    scene_radius: jnp.ndarray,
    n_inner: int,
    bg_len: float,
    norm_type: str = "inf",
    t_boundary: float = 1.5,
) -> RaySamples:
    """FourierGrid-style unbounded sampling: normalize, march, contract.

    Mirrors ``FourierGridModel.sample_ray`` (:509-552): rays are recentred by
    (o-center)/radius, directions unit-normalized, t from
    :func:`contracted_t_values` with N_outer = N_inner, then contracted.
    Mask = all samples live (the model's inner_mask is returned via t/contract
    at the model layer when needed).
    """
    o = (rays_o - scene_center) / scene_radius
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = contracted_t_values(n_inner, n_inner, t_boundary=t_boundary, dtype=rays_o.dtype)
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    pts, inner = contract(pts, bg_len=bg_len, norm_type=norm_type)
    mask = jnp.ones(pts.shape[:2], dtype=bool)
    return RaySamples(pts=pts, mask=mask, t=jnp.broadcast_to(t, pts.shape[:2])), inner


def cumdist_thres(dist: jnp.ndarray, thres: float) -> jnp.ndarray:
    """Per-ray cumulative-distance threshold mask (ub360_utils_kernel.cu:12-32).

    Running sum of per-step distances; emit True and reset the accumulator
    whenever it exceeds ``thres``. Used by dcvgo to skip oversampled
    contracted points. Implemented as a lax.scan over the sample axis
    (vectorized across rays).
    """
    import jax

    def body(cum, d):
        cum = cum + d
        over = cum > thres
        cum = cum * (1.0 - over.astype(d.dtype))
        return cum, over

    _, mask = jax.lax.scan(body, jnp.zeros(dist.shape[0], dist.dtype), dist.T)
    return mask.T


def compact_samples(
    mask: jnp.ndarray,
    budget: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-budget sample compaction — the TPU answer to the reference's
    dynamic-shape fast_color_thres/maskcache gathers (SURVEY.md §7.3).

    Given a live-sample mask [N, S], select per ray the first ``budget``
    live samples (near→far order preserved) as static-shape indices.

    Returns (sel [N, budget] int32 sample indices, sel_mask [N, budget]) —
    rays with fewer than ``budget`` live samples get their tail masked off.
    Downstream, expensive field queries gather only the selected samples:
    S → budget is pure compute/bandwidth savings at identical output
    (provided the mask is conservative).
    """
    n, s = mask.shape
    order = jnp.arange(s, dtype=jnp.int32)
    # score: live samples get descending scores in near-to-far order; dead
    # samples score below every live one. top_k then yields the first
    # `budget` live sample positions, already sorted near→far.
    score = jnp.where(mask, s - order, -1)
    top_scores, sel = jax.lax.top_k(score, budget)
    sel_mask = top_scores > 0
    sel = jnp.where(sel_mask, sel, 0)
    return sel.astype(jnp.int32), sel_mask


def gather_samples(x: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    """Gather per-ray selected samples: x [N, S, ...] + sel [N, B] -> [N, B, ...].

    Implemented as one flat row-gather (rows of the trailing dims) — on TPU
    this runs ~3x faster than the equivalent take_along_axis lowering
    (measured in tools/probe_gather.py)."""
    n, s = x.shape[0], x.shape[1]
    flat = x.reshape(n * s, *x.shape[2:])
    idx = (jnp.arange(n, dtype=sel.dtype)[:, None] * s + sel).reshape(-1)
    out = jnp.take(flat, idx, axis=0)
    return out.reshape(n, sel.shape[1], *x.shape[2:])


def scatter_samples(
    values: jnp.ndarray, sel: jnp.ndarray, s: int, fill=0.0
) -> jnp.ndarray:
    """Inverse of gather_samples: scatter [N, B, ...] back to [N, S, ...]."""
    n, b = sel.shape
    out_shape = (n, s) + values.shape[2:]
    out = jnp.full(out_shape, fill, dtype=values.dtype)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, b))
    return out.at[rows, sel].set(values)


def maskcache_lookup(
    mask_grid: jnp.ndarray,
    xyz: jnp.ndarray,
    xyz2ijk_scale: jnp.ndarray,
    xyz2ijk_shift: jnp.ndarray,
) -> jnp.ndarray:
    """Nearest-voxel boolean occupancy lookup (render_utils_kernel.cu:363-424).

    ijk = round(xyz*scale + shift); out-of-bounds -> False. Returns [...]-bool.
    """
    ijk = jnp.round(xyz * xyz2ijk_scale + xyz2ijk_shift).astype(jnp.int32)
    sz = jnp.asarray(mask_grid.shape, dtype=jnp.int32)
    in_bounds = jnp.all((ijk >= 0) & (ijk < sz), axis=-1)
    ijk_c = jnp.clip(ijk, 0, sz - 1)
    # flat 1-D take instead of 3-D advanced indexing: one fused index compute
    # + single-axis gather runs ~1.4x faster on TPU (tools probe: 77 vs 53
    # M rows/s)
    flat_idx = (ijk_c[..., 0] * sz[1] + ijk_c[..., 1]) * sz[2] + ijk_c[..., 2]
    vals = jnp.take(mask_grid.reshape(-1), flat_idx, mode="clip")
    return vals & in_bounds
