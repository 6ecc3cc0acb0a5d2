"""DVGO: bounded direct voxel-grid optimization, TPU-native.

Re-designs ``DirectVoxGO`` (``/root/reference/FourierGrid/dvgo.py:26-425``)
as a (static config, params pytree, pure functions) triple:

  * fixed-shape masked ray marching instead of CUDA variable-length sampling;
  * the maskcache / fast_color_thres compactions become multiplicative masks;
  * the whole forward is jit/grad-able and runs as one XLA program.

Config mirrors the reference ``get_kwargs`` so checkpoints round-trip.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unboundednerfpytorch_tpu.fields.grids import (
    DenseGrid,
    MaskGrid,
    TensoRFGrid,
)
from unboundednerfpytorch_tpu.fields.mlp import MLP
from unboundednerfpytorch_tpu.models import common
from unboundednerfpytorch_tpu.ops import alpha as alpha_ops
from unboundednerfpytorch_tpu.ops import interp, sampling


@dataclasses.dataclass(frozen=True)
class DVGOConfig:
    """Static model config (hashable → usable as a jit static arg).

    Field meanings follow the reference constructor (dvgo.py:27-37) and
    configs/default.py.
    """

    xyz_min: tuple
    xyz_max: tuple
    num_voxels: int
    num_voxels_base: int
    alpha_init: float = 1e-6
    fast_color_thres: float = 0.0
    density_type: str = "DenseGrid"
    k0_type: str = "DenseGrid"
    density_config: tuple = ()  # frozen dict items, e.g. (("n_comp", 8),)
    k0_config: tuple = ()
    rgbnet_dim: int = 0
    rgbnet_direct: bool = False
    rgbnet_full_implicit: bool = False
    rgbnet_depth: int = 3
    rgbnet_width: int = 128
    viewbase_pe: int = 4
    mask_cache_world_size: tuple | None = None
    mask_cache_thres: float = 1e-3
    grid_dtype: str = "float32"  # bfloat16 halves gather bandwidth

    # ---- derived quantities (reference _set_grid_resolution, dvgo.py:154-163)
    @property
    def voxel_size(self) -> float:
        ext = np.prod(np.array(self.xyz_max) - np.array(self.xyz_min))
        return float((ext / self.num_voxels) ** (1.0 / 3.0))

    @property
    def voxel_size_base(self) -> float:
        ext = np.prod(np.array(self.xyz_max) - np.array(self.xyz_min))
        return float((ext / self.num_voxels_base) ** (1.0 / 3.0))

    @property
    def world_size(self) -> tuple:
        ext = np.array(self.xyz_max) - np.array(self.xyz_min)
        return tuple(int(v) for v in (ext / self.voxel_size).astype(np.int64))

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def act_shift(self) -> float:
        return common.act_shift_from_alpha_init(self.alpha_init)

    @property
    def k0_dim(self) -> int:
        if self.rgbnet_dim <= 0:
            return 3
        return 0 if self.rgbnet_full_implicit else self.rgbnet_dim

    @property
    def rgbnet_in_dim(self) -> int:
        dim0 = 3 + 3 * self.viewbase_pe * 2
        if self.rgbnet_full_implicit:
            return dim0
        if self.rgbnet_direct:
            return dim0 + self.k0_dim
        return dim0 + self.k0_dim - 3

    def with_num_voxels(self, num_voxels: int) -> "DVGOConfig":
        return dataclasses.replace(self, num_voxels=num_voxels)


@struct.dataclass
class DVGOParams:
    density: Any  # DenseGrid | TensoRFGrid, 1 channel
    k0: Any  # DenseGrid | TensoRFGrid
    rgbnet: MLP | None
    act_shift: jnp.ndarray  # scalar buffer (decayed at pg_scale boundaries)
    mask_cache: MaskGrid  # boolean occupancy (non-trainable)


def _make_grid(grid_type: str, channels: int, world_size, cfg: DVGOConfig, grid_cfg, key):
    if grid_type == "DenseGrid":
        return DenseGrid.create(channels, world_size, cfg.xyz_min, cfg.xyz_max,
                                dtype=jnp.dtype(cfg.grid_dtype))
    if grid_type == "TensoRFGrid":
        gc = dict(grid_cfg)
        return TensoRFGrid.create(
            channels, world_size, cfg.xyz_min, cfg.xyz_max,
            n_comp=gc["n_comp"], n_comp_xy=gc.get("n_comp_xy"), key=key,
        )
    raise NotImplementedError(grid_type)


def create(cfg: DVGOConfig, key: jax.Array, mask: jnp.ndarray | None = None) -> DVGOParams:
    k1, k2, k3 = jax.random.split(key, 3)
    ws = cfg.world_size
    density = _make_grid(cfg.density_type, 1, ws, cfg, cfg.density_config, k1)
    k0 = _make_grid(cfg.k0_type, max(cfg.k0_dim, 1), ws, cfg, cfg.k0_config, k2)
    rgbnet = None
    if cfg.rgbnet_dim > 0:
        rgbnet = MLP.create(
            k3, cfg.rgbnet_in_dim, cfg.rgbnet_width, 3, cfg.rgbnet_depth
        )
    mc_ws = cfg.mask_cache_world_size or ws
    mask_cache = MaskGrid.create(mc_ws, cfg.xyz_min, cfg.xyz_max, mask=mask)
    return DVGOParams(
        density=density,
        k0=k0,
        rgbnet=rgbnet,
        act_shift=jnp.asarray(cfg.act_shift, jnp.float32),
        mask_cache=mask_cache,
    )


def n_samples(cfg: DVGOConfig, stepsize: float) -> int:
    return sampling.n_samples_cap(cfg.world_size, stepsize)


def activate_density(params: DVGOParams, cfg: DVGOConfig, density, interval=None):
    interval = cfg.voxel_size_ratio if interval is None else interval
    return alpha_ops.raw2alpha(density, params.act_shift, interval)


def build_render_cache(params: "DVGOParams", cfg: "DVGOConfig"):
    """Packed-corner fused density+k0 table for rendering with frozen
    params (ops/packed.py engine; one gathered row per sample instead of
    eight per field). DenseGrid-only; None when inapplicable or oversized.
    """
    from unboundednerfpytorch_tpu.fields.grids import DenseGrid
    from unboundednerfpytorch_tpu.ops import packed as packed_ops

    if not (
        isinstance(params.density, DenseGrid)
        and isinstance(params.k0, DenseGrid)
        and params.density.grid.shape[:3] == params.k0.grid.shape[:3]
        and not cfg.rgbnet_full_implicit
    ):
        return None
    cf = 1 + params.k0.grid.shape[-1]
    itemsize = jnp.dtype(params.density.grid.dtype).itemsize
    if packed_ops.packed_table_bytes(
        params.density.grid.shape[:3], cf, itemsize
    ) > int(2.6e9):
        return None

    @jax.jit
    def _build(dg, kg):
        return packed_ops.pack_corners(jnp.concatenate([dg, kg], axis=-1))

    return _build(params.density.grid, params.k0.grid)


def forward(
    params: DVGOParams,
    cfg: DVGOConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    *,
    near: float,
    stepsize: float,
    bg: float = 1.0,
    n_samples_override: int | None = None,
    cache=None,
) -> common.RenderResult:
    """Volume-render a batch of rays (reference forward, dvgo.py:330-425).

    ``cache``: optional packed fused table (:func:`build_render_cache`) —
    density and k0 then cost ONE gathered row per sample together."""
    N = rays_o.shape[0]
    S = n_samples_override or n_samples(cfg, stepsize)
    stepdist = stepsize * cfg.voxel_size
    interval = stepsize * cfg.voxel_size_ratio

    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)
    samples = sampling.sample_pts_on_rays(
        rays_o, rays_d, xyz_min, xyz_max, near, stepdist, S
    )
    pts, mask, t = samples.pts, samples.mask, samples.t

    # known-freespace skip (maskcache gather -> multiplicative mask)
    mask = mask & params.mask_cache(pts)

    fused_vals = None
    if cache is not None:
        from unboundednerfpytorch_tpu.fields.grids import _norm01
        from unboundednerfpytorch_tpu.ops import packed as packed_ops

        dims = params.density.grid.shape[:3]
        c01 = _norm01(pts, params.density.xyz_min, params.density.xyz_max)
        base, w = packed_ops.corner_base_and_weights(c01, dims)
        fused_vals = packed_ops.packed_trilerp(
            cache, base, w, 1 + params.k0.grid.shape[-1]
        )
        density = fused_vals[..., 0]
    else:
        density = params.density(pts)[..., 0]  # [N, S]
    alpha = activate_density(params, cfg, density, interval)
    if cfg.fast_color_thres > 0:
        mask = mask & (alpha > cfg.fast_color_thres)

    weights, alphainv_last = alpha_ops.alpha2weights(alpha, mask=mask)
    if cfg.fast_color_thres > 0:
        mask = mask & (weights > cfg.fast_color_thres)
        weights = weights * mask.astype(weights.dtype)

    # color
    if cfg.rgbnet_full_implicit:
        k0 = jnp.zeros((*pts.shape[:-1], 0), dtype=pts.dtype)
    elif fused_vals is not None:
        k0 = fused_vals[..., 1:]
    else:
        k0 = params.k0(pts)  # [N, S, k0_dim]

    if params.rgbnet is None:
        rgb = jax.nn.sigmoid(k0[..., :3])
    else:
        if cfg.rgbnet_direct or cfg.rgbnet_full_implicit:
            k0_view = k0
        else:
            k0_view = k0[..., 3:]
            k0_diffuse = k0[..., :3]
        vemb = common.viewdir_embedding(viewdirs, cfg.viewbase_pe)  # [N, E]
        vemb = jnp.broadcast_to(vemb[:, None, :], (N, S, vemb.shape[-1]))
        feat = jnp.concatenate([k0_view, vemb], axis=-1)
        logit = params.rgbnet(feat)
        if cfg.rgbnet_direct or cfg.rgbnet_full_implicit:
            rgb = jax.nn.sigmoid(logit)
        else:
            rgb = jax.nn.sigmoid(logit + k0_diffuse)

    rgb_marched = common.composite(weights, rgb, alphainv_last, bg)
    step_ids = jnp.arange(S, dtype=weights.dtype)[None, :]
    depth = jnp.sum(weights * step_ids, axis=-1)

    return common.RenderResult(
        rgb_marched=rgb_marched,
        alphainv_last=alphainv_last,
        weights=weights,
        raw_alpha=alpha,
        raw_rgb=rgb,
        raw_density=density,
        mask=mask,
        t=t,
        s=t,
        depth=depth,
        n_max=S,
    )


def hit_coarse_geo(
    params: DVGOParams,
    cfg: DVGOConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    stepsize: float,
) -> jnp.ndarray:
    """Whether each ray hits solved coarse geometry (dvgo.py:292-304): march
    through the bbox and OR the occupancy-cache hits. Used by the
    'in_maskcache' training-ray filter."""
    S = n_samples(cfg, stepsize)
    samples = sampling.sample_pts_on_rays(
        rays_o, rays_d, jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max),
        near, stepsize * cfg.voxel_size, S,
    )
    hit = samples.mask & params.mask_cache(samples.pts)
    return jnp.any(hit, axis=-1)


# ---------------------------------------------------------------------------
# Lifecycle ops (no-grad in the reference; pure param->param here)
# ---------------------------------------------------------------------------

def _grid_coords(world_size, xyz_min, xyz_max):
    axes = [
        jnp.linspace(mn, mx, int(n))
        for mn, mx, n in zip(xyz_min, xyz_max, world_size)
    ]
    return jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)


def maskout_near_cam_vox(
    params: DVGOParams, cfg: DVGOConfig, cam_o: jnp.ndarray, near_clip: float
) -> DVGOParams:
    """Set density to -100 for voxels closer than near_clip to any camera
    (dvgo.py:185-210)."""
    xyz = _grid_coords(cfg.world_size, cfg.xyz_min, cfg.xyz_max)  # [X,Y,Z,3]
    d2 = jnp.min(
        jnp.sum((xyz[..., None, :] - cam_o) ** 2, axis=-1), axis=-1
    )
    near_mask = jnp.sqrt(d2) <= near_clip
    dense = params.density.get_dense_grid()
    new_grid = jnp.where(near_mask[..., None], -100.0, dense)
    return params.replace(density=params.density.replace(grid=new_grid))


def scale_volume_grid(
    params: DVGOParams, cfg: DVGOConfig, num_voxels: int
) -> tuple[DVGOParams, DVGOConfig]:
    """Progressive upsampling (dvgo.py:212-236): trilinear-resize grids and
    refresh the occupancy cache from the upscaled density."""
    new_cfg = cfg.with_num_voxels(num_voxels)
    ws = new_cfg.world_size
    density = params.density.scale_volume_grid(ws)
    k0 = params.k0.scale_volume_grid(ws)
    params = params.replace(density=density, k0=k0)

    if int(np.prod(ws)) <= 256**3:
        xyz = _grid_coords(ws, cfg.xyz_min, cfg.xyz_max)
        dense_alpha = activate_density(
            params, new_cfg, density.get_dense_grid()[..., 0]
        )
        pooled = interp.max_pool_3d_same(dense_alpha)
        new_mask = params.mask_cache(xyz) & (pooled > new_cfg.fast_color_thres)
        params = params.replace(
            mask_cache=MaskGrid.create(ws, cfg.xyz_min, cfg.xyz_max, mask=new_mask)
        )
    return params, new_cfg


def update_occupancy_cache(params: DVGOParams, cfg: DVGOConfig) -> DVGOParams:
    """AND the occupancy mask with pooled current alpha (dvgo.py:238-246)."""
    mc_shape = params.mask_cache.mask.shape
    xyz = _grid_coords(mc_shape, cfg.xyz_min, cfg.xyz_max)
    density = params.density(xyz)[..., 0]
    alpha = activate_density(params, cfg, density)
    pooled = interp.max_pool_3d_same(alpha)
    new_mask = params.mask_cache.mask & (pooled > cfg.fast_color_thres)
    return params.replace(mask_cache=params.mask_cache.replace(mask=new_mask))


def voxel_count_views(
    params: DVGOParams,
    cfg: DVGOConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    stepsize: float,
) -> jnp.ndarray:
    """Per-voxel count of views whose rays touch it (dvgo.py:247-277), used
    for per-voxel lr. rays are [V, R, 3] (V views, R rays each); returns the
    [X, Y, Z, 1] count of views with interpolation-weight sum > 1."""
    S = sampling.n_samples_cap(cfg.world_size, stepsize)
    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)

    def one_view(ro, rd):
        t_min, _ = sampling.ray_aabb(ro, rd, xyz_min, xyz_max, near)
        rng = jnp.arange(S, dtype=ro.dtype)
        step = stepsize * cfg.voxel_size * rng
        d_norm = jnp.linalg.norm(rd, axis=-1, keepdims=True)
        interpx = t_min[:, None] + step[None, :] / d_norm
        pts = ro[:, None, :] + rd[:, None, :] * interpx[..., None]
        ones = DenseGrid.create(1, cfg.world_size, cfg.xyz_min, cfg.xyz_max)

        def total(g):
            return jnp.sum(ones.replace(grid=g)(pts))

        grad = jax.grad(total)(ones.grid)
        return (grad > 1).astype(jnp.float32)

    counts = jax.lax.map(lambda rr: one_view(rr[0], rr[1]), (rays_o, rays_d))
    return jnp.sum(counts, axis=0)
