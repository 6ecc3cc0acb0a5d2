"""DCVGO: unbounded inward scenes via Mip-NeRF-360-style contraction.

Re-designs ``DirectContractedVoxGO``
(``/root/reference/FourierGrid/dcvgo.py:28-384``) TPU-first: the inner
linspace[0,2] + outer 2/s sampling, infinity/L2-norm contraction, cumdist
oversample skip, and occupancy/alpha thresholds all become fixed-shape masks;
the forward is one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unboundednerfpytorch_tpu.fields.grids import DenseGrid, MaskGrid
from unboundednerfpytorch_tpu.fields.mlp import MLP
from unboundednerfpytorch_tpu.models import common
from unboundednerfpytorch_tpu.ops import alpha as alpha_ops
from unboundednerfpytorch_tpu.ops import interp, sampling


@dataclasses.dataclass(frozen=True)
class DCVGOConfig:
    """scene_center/radius map world rays into the contracted cube
    [-1-bg_len, 1+bg_len]^3 that the grids live in (dcvgo.py:43-49)."""

    scene_center: tuple
    scene_radius: tuple
    num_voxels: int
    num_voxels_base: int
    alpha_init: float = 1e-6
    fast_color_thres: float = 0.0
    bg_len: float = 0.2
    contracted_norm: str = "inf"
    density_type: str = "DenseGrid"
    k0_type: str = "DenseGrid"
    rgbnet_dim: int = 0
    rgbnet_depth: int = 3
    rgbnet_width: int = 128
    viewbase_pe: int = 4
    mask_cache_world_size: tuple | None = None
    stepsize: float = 0.5
    grid_dtype: str = "float32"

    @property
    def xyz_min(self) -> tuple:
        b = 1.0 + self.bg_len
        return (-b, -b, -b)

    @property
    def xyz_max(self) -> tuple:
        b = 1.0 + self.bg_len
        return (b, b, b)

    @property
    def voxel_size(self) -> float:
        ext = np.prod(np.array(self.xyz_max) - np.array(self.xyz_min))
        return float((ext / self.num_voxels) ** (1.0 / 3.0))

    @property
    def voxel_size_base(self) -> float:
        ext = np.prod(np.array(self.xyz_max) - np.array(self.xyz_min))
        return float((ext / self.num_voxels_base) ** (1.0 / 3.0))

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def world_size(self) -> tuple:
        ext = np.array(self.xyz_max) - np.array(self.xyz_min)
        return tuple(int(v) for v in (ext / self.voxel_size).astype(np.int64))

    @property
    def world_len(self) -> int:
        return self.world_size[0]

    @property
    def n_inner(self) -> int:
        """N_inner = int(2/(2+2·bg_len)·world_len/stepsize)+1 (dcvgo.py:240)."""
        return int(2 / (2 + 2 * self.bg_len) * self.world_len / self.stepsize) + 1

    @property
    def act_shift(self) -> float:
        return common.act_shift_from_alpha_init(self.alpha_init)

    @property
    def k0_dim(self) -> int:
        return 3 if self.rgbnet_dim <= 0 else self.rgbnet_dim

    @property
    def rgbnet_in_dim(self) -> int:
        return 3 + 3 * self.viewbase_pe * 2 + self.k0_dim

    def with_num_voxels(self, num_voxels: int) -> "DCVGOConfig":
        return dataclasses.replace(self, num_voxels=num_voxels)


def config_from(cfg_model, xyz_min, xyz_max, num_voxels) -> DCVGOConfig:
    """Build from a ModelRenderConfig + world bbox (run_train.py:43-47)."""
    xyz_min = np.asarray(xyz_min, np.float64)
    xyz_max = np.asarray(xyz_max, np.float64)
    return DCVGOConfig(
        scene_center=tuple(((xyz_min + xyz_max) * 0.5).tolist()),
        scene_radius=tuple(((xyz_max - xyz_min) * 0.5).tolist()),
        num_voxels=num_voxels,
        num_voxels_base=cfg_model.num_voxels_base_rgb,
        alpha_init=cfg_model.alpha_init,
        fast_color_thres=__import__(
            "unboundednerfpytorch_tpu.configs.schema", fromlist=["x"]
        ).normalize_fast_color_thres(cfg_model)[0],
        bg_len=cfg_model.bg_len,
        contracted_norm=cfg_model.contracted_norm,
        density_type=cfg_model.density_type,
        k0_type=cfg_model.k0_type,
        rgbnet_dim=cfg_model.rgbnet_dim,
        rgbnet_depth=cfg_model.rgbnet_depth,
        rgbnet_width=cfg_model.rgbnet_width,
        stepsize=cfg_model.stepsize,
        grid_dtype=getattr(cfg_model, "grid_dtype", "float32"),
    )


@struct.dataclass
class DCVGOParams:
    density: Any
    k0: Any
    rgbnet: MLP | None
    act_shift: jnp.ndarray
    mask_cache: MaskGrid


def create(cfg: DCVGOConfig, key: jax.Array) -> DCVGOParams:
    k1, k2, k3 = jax.random.split(key, 3)
    ws = cfg.world_size
    dt = jnp.dtype(cfg.grid_dtype)
    density = DenseGrid.create(1, ws, cfg.xyz_min, cfg.xyz_max, dtype=dt)
    k0 = DenseGrid.create(cfg.k0_dim, ws, cfg.xyz_min, cfg.xyz_max, dtype=dt)
    rgbnet = None
    if cfg.rgbnet_dim > 0:
        rgbnet = MLP.create(k3, cfg.rgbnet_in_dim, cfg.rgbnet_width, 3, cfg.rgbnet_depth)
    mc_ws = cfg.mask_cache_world_size or ws
    return DCVGOParams(
        density=density,
        k0=k0,
        rgbnet=rgbnet,
        act_shift=jnp.asarray(cfg.act_shift, jnp.float32),
        mask_cache=MaskGrid.create(mc_ws, cfg.xyz_min, cfg.xyz_max),
    )


def activate_density(params: DCVGOParams, cfg: DCVGOConfig, density, interval=None):
    interval = cfg.voxel_size_ratio if interval is None else interval
    return alpha_ops.raw2alpha(density, params.act_shift, interval)


def sample_ray(cfg: DCVGOConfig, rays_o, rays_d):
    """Contracted central sampling (dcvgo.py:228-262, t_boundary=2)."""
    o = (rays_o - jnp.asarray(cfg.scene_center)) / jnp.asarray(cfg.scene_radius)
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = sampling.contracted_t_values(
        cfg.n_inner, cfg.n_inner, t_boundary=2.0, dtype=rays_o.dtype
    )
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    pts, inner = sampling.contract(
        pts, bg_len=cfg.bg_len, norm_type=cfg.contracted_norm
    )
    return pts, inner, t


def build_render_cache(params: "DCVGOParams", cfg: "DCVGOConfig"):
    """Packed-corner fused density+k0 table for rendering with frozen
    params (ops/packed.py; one gathered row per sample for both fields).
    DenseGrid-only; None when inapplicable or oversized."""
    from unboundednerfpytorch_tpu.fields.grids import DenseGrid
    from unboundednerfpytorch_tpu.ops import packed as packed_ops

    if not (
        isinstance(params.density, DenseGrid)
        and isinstance(params.k0, DenseGrid)
        and params.density.grid.shape[:3] == params.k0.grid.shape[:3]
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
    params: DCVGOParams,
    cfg: DCVGOConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    *,
    near: float = 0.0,
    stepsize: float | None = None,
    bg: float = 1.0,
    rand_bkgd_key: jax.Array | None = None,
    cache=None,
) -> common.RenderResult:
    del near  # contracted sampling ignores near/far (dcvgo.py:228)
    stepsize = cfg.stepsize if stepsize is None else stepsize
    N = rays_o.shape[0]
    interval = stepsize * cfg.voxel_size_ratio

    pts, inner, t = sample_ray(cfg, rays_o, rays_d)
    S = pts.shape[1]

    # oversample skip: keep inner points + outer points spaced >= dist_thres
    # along the contracted path (dcvgo.py:285-294)
    dist_thres = (2 + 2 * cfg.bg_len) / cfg.world_len * stepsize * 0.95
    dist = jnp.linalg.norm(pts[:, 1:] - pts[:, :-1], axis=-1)
    cd = sampling.cumdist_thres(dist, dist_thres)
    mask = inner
    mask = mask.at[:, 1:].set(mask[:, 1:] | cd)

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
        density = params.density(pts)[..., 0]
    alpha = activate_density(params, cfg, density, interval)
    if cfg.fast_color_thres > 0:
        mask = mask & (alpha > cfg.fast_color_thres)

    weights, alphainv_last = alpha_ops.alpha2weights(alpha, mask=mask)
    if cfg.fast_color_thres > 0:
        mask = mask & (weights > cfg.fast_color_thres)
        weights = weights * mask.astype(weights.dtype)

    k0 = fused_vals[..., 1:] if fused_vals is not None else params.k0(pts)
    if params.rgbnet is None:
        rgb = jax.nn.sigmoid(k0[..., :3])
    else:
        vemb = common.viewdir_embedding(viewdirs, cfg.viewbase_pe)
        vemb = jnp.broadcast_to(vemb[:, None, :], (N, S, vemb.shape[-1]))
        rgb = jax.nn.sigmoid(params.rgbnet(jnp.concatenate([k0, vemb], -1)))

    if rand_bkgd_key is not None:
        bg_color = jax.random.uniform(rand_bkgd_key, (N, 3))
        rgb_marched = (
            jnp.einsum("ns,nsc->nc", weights, rgb)
            + alphainv_last[:, None] * bg_color
        )
    else:
        rgb_marched = common.composite(weights, rgb, alphainv_last, bg)

    t2 = jnp.broadcast_to(t, (N, S))
    s = 1.0 - 1.0 / (1.0 + t2)
    depth = jnp.sum(weights * s, axis=-1)
    wsum_mid = jnp.sum(weights * inner.astype(weights.dtype), axis=-1)

    return common.RenderResult(
        rgb_marched=rgb_marched,
        alphainv_last=alphainv_last,
        weights=weights,
        raw_alpha=alpha,
        raw_rgb=rgb,
        raw_density=density,
        mask=mask,
        t=t2,
        s=s,
        depth=depth,
        n_max=S,
        wsum_mid=wsum_mid,
    )


def scale_volume_grid(params: DCVGOParams, cfg: DCVGOConfig, num_voxels: int):
    new_cfg = cfg.with_num_voxels(num_voxels)
    ws = new_cfg.world_size
    params = params.replace(
        density=params.density.scale_volume_grid(ws),
        k0=params.k0.scale_volume_grid(ws),
    )
    if int(np.prod(ws)) <= 256**3:
        axes = [jnp.linspace(mn, mx, n) for mn, mx, n in
                zip(cfg.xyz_min, cfg.xyz_max, ws)]
        xyz = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1)
        alpha = activate_density(
            params, new_cfg, params.density.get_dense_grid()[..., 0]
        )
        pooled = interp.max_pool_3d_same(alpha)
        new_mask = params.mask_cache(xyz) & (pooled > new_cfg.fast_color_thres)
        params = params.replace(
            mask_cache=MaskGrid.create(ws, cfg.xyz_min, cfg.xyz_max, mask=new_mask)
        )
    return params, new_cfg


def update_occupancy_cache(params: DCVGOParams, cfg: DCVGOConfig) -> DCVGOParams:
    mc_shape = params.mask_cache.mask.shape
    axes = [jnp.linspace(mn, mx, n) for mn, mx, n in
            zip(cfg.xyz_min, cfg.xyz_max, mc_shape)]
    xyz = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1)
    alpha = activate_density(params, cfg, params.density(xyz)[..., 0])
    pooled = interp.max_pool_3d_same(alpha)
    new_mask = params.mask_cache.mask & (pooled > cfg.fast_color_thres)
    return params.replace(mask_cache=params.mask_cache.replace(mask=new_mask))
