"""DMPIGO: forward-facing NDC scenes as a multiplane image.

Re-designs ``DirectMPIGO`` (``/root/reference/FourierGrid/dmpigo.py:18-340``):
world_size [X, Y, mpi_depth], a per-depth non-trainable ``act_shift`` grid
that equalizes the initial per-plane alpha, equidistant NDC sampling, and the
usual occupancy/threshold masking — all fixed shape.
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
class DMPIGOConfig:
    xyz_min: tuple
    xyz_max: tuple
    num_voxels: int
    mpi_depth: int = 128
    fast_color_thres: float = 0.0
    density_type: str = "DenseGrid"
    k0_type: str = "DenseGrid"
    rgbnet_dim: int = 0
    rgbnet_depth: int = 3
    rgbnet_width: int = 128
    viewbase_pe: int = 0
    mask_cache_world_size: tuple | None = None
    stepsize: float = 1.0

    @property
    def world_size(self) -> tuple:
        """[X, Y] from num_voxels/mpi_depth over the xy extent; Z = mpi_depth
        (dmpigo.py:120-130)."""
        ext = np.array(self.xyz_max) - np.array(self.xyz_min)
        r = np.sqrt(self.num_voxels / self.mpi_depth / (ext[0] * ext[1]))
        return (int(ext[0] * r), int(ext[1] * r), int(self.mpi_depth))

    @property
    def voxel_size_ratio(self) -> float:
        return 256.0 / self.mpi_depth

    @property
    def k0_dim(self) -> int:
        return 3 if self.rgbnet_dim <= 0 else self.rgbnet_dim

    @property
    def rgbnet_in_dim(self) -> int:
        return 3 + 3 * self.viewbase_pe * 2 + self.k0_dim

    def n_samples(self, stepsize: float) -> int:
        return int((self.mpi_depth - 1) / stepsize) + 1

    def with_num_voxels(self, num_voxels: int) -> "DMPIGOConfig":
        return dataclasses.replace(self, num_voxels=num_voxels)


def config_from(cfg_model, xyz_min, xyz_max, num_voxels) -> DMPIGOConfig:
    return DMPIGOConfig(
        xyz_min=tuple(float(v) for v in xyz_min),
        xyz_max=tuple(float(v) for v in xyz_max),
        num_voxels=num_voxels,
        mpi_depth=cfg_model.mpi_depth,
        fast_color_thres=__import__(
            "unboundednerfpytorch_tpu.configs.schema", fromlist=["x"]
        ).normalize_fast_color_thres(cfg_model)[0],
        density_type=cfg_model.density_type,
        k0_type=cfg_model.k0_type,
        rgbnet_dim=cfg_model.rgbnet_dim,
        rgbnet_depth=cfg_model.rgbnet_depth,
        rgbnet_width=cfg_model.rgbnet_width,
        stepsize=cfg_model.stepsize,
    )


@struct.dataclass
class DMPIGOParams:
    density: Any
    k0: Any
    rgbnet: MLP | None
    act_shift: jnp.ndarray  # [mpi_depth] per-plane bias, non-trainable
    mask_cache: MaskGrid


def _init_act_shift(mpi_depth: int, voxel_size_ratio: float) -> np.ndarray:
    """Per-depth bias making each plane's initial alpha equal (dmpigo.py:47-57)."""
    g = np.full([mpi_depth], 1.0 / mpi_depth - 1e-6)
    p = [1 - g[0]]
    for i in range(1, len(g)):
        p.append((1 - g[: i + 1].sum()) / (1 - g[:i].sum()))
    return np.array(
        [np.log(pi ** (-1.0 / voxel_size_ratio) - 1.0) for pi in p], np.float32
    )


def create(cfg: DMPIGOConfig, key: jax.Array) -> DMPIGOParams:
    k1, k2, k3 = jax.random.split(key, 3)
    ws = cfg.world_size
    density = DenseGrid.create(1, ws, cfg.xyz_min, cfg.xyz_max)
    k0 = DenseGrid.create(cfg.k0_dim, ws, cfg.xyz_min, cfg.xyz_max)
    rgbnet = None
    if cfg.rgbnet_dim > 0:
        rgbnet = MLP.create(k3, cfg.rgbnet_in_dim, cfg.rgbnet_width, 3, cfg.rgbnet_depth)
    mc_ws = cfg.mask_cache_world_size or ws
    return DMPIGOParams(
        density=density,
        k0=k0,
        rgbnet=rgbnet,
        act_shift=jnp.asarray(_init_act_shift(cfg.mpi_depth, cfg.voxel_size_ratio)),
        mask_cache=MaskGrid.create(mc_ws, cfg.xyz_min, cfg.xyz_max),
    )


def _act_shift_at(params: DMPIGOParams, cfg: DMPIGOConfig, pts: jnp.ndarray):
    """Sample the per-depth act_shift line grid at the points' z coordinate
    (the reference stores it as a [1,1,mpi_depth] DenseGrid)."""
    z01 = (pts[..., 2] - cfg.xyz_min[2]) / (cfg.xyz_max[2] - cfg.xyz_min[2])
    line = params.act_shift[None, None, :, None]  # [1,1,D,1]
    coords = jnp.stack(
        [jnp.zeros_like(z01), jnp.zeros_like(z01), z01], axis=-1
    )
    return interp.grid_sample_3d(line, coords)[..., 0]


def build_render_cache(params: "DMPIGOParams", cfg: "DMPIGOConfig"):
    """Packed-corner fused density+k0 table for rendering with frozen
    params (ops/packed.py). DenseGrid-only; None when inapplicable."""
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
    params: DMPIGOParams,
    cfg: DMPIGOConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    *,
    stepsize: float | None = None,
    bg: float = 1.0,
    rand_bkgd_key: jax.Array | None = None,
    cache=None,
) -> common.RenderResult:
    stepsize = cfg.stepsize if stepsize is None else stepsize
    N = rays_o.shape[0]
    S = cfg.n_samples(stepsize)
    interval = stepsize * cfg.voxel_size_ratio

    samples = sampling.sample_ndc_pts_on_rays(
        rays_o, rays_d, jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max), S
    )
    pts, mask, t = samples.pts, samples.mask, samples.t

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
        density = fused_vals[..., 0] + _act_shift_at(params, cfg, pts)
    else:
        density = params.density(pts)[..., 0] + _act_shift_at(params, cfg, pts)
    alpha = alpha_ops.raw2alpha(density, 0.0, interval)
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

    step_ids = jnp.arange(S, dtype=weights.dtype)[None, :]
    s = jnp.broadcast_to((step_ids + 0.5) / S, (N, S))
    depth = jnp.sum(weights * s, axis=-1)

    return common.RenderResult(
        rgb_marched=rgb_marched,
        alphainv_last=alphainv_last,
        weights=weights,
        raw_alpha=alpha,
        raw_rgb=rgb,
        raw_density=density,
        mask=mask,
        t=t,
        s=s,
        depth=depth,
        n_max=S,
    )


def scale_volume_grid(params: DMPIGOParams, cfg: DMPIGOConfig, num_voxels: int):
    """Upsample xy resolution, keep mpi_depth (dmpigo.py:151-172)."""
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
        dens = params.density.get_dense_grid()[..., 0] + params.act_shift[None, None, :]
        alpha = alpha_ops.raw2alpha(dens, 0.0, new_cfg.voxel_size_ratio)
        pooled = interp.max_pool_3d_same(alpha)
        new_mask = params.mask_cache(xyz) & (pooled > new_cfg.fast_color_thres)
        params = params.replace(
            mask_cache=MaskGrid.create(ws, cfg.xyz_min, cfg.xyz_max, mask=new_mask)
        )
    return params, new_cfg


def update_occupancy_cache(params: DMPIGOParams, cfg: DMPIGOConfig) -> DMPIGOParams:
    mc_shape = params.mask_cache.mask.shape
    axes = [jnp.linspace(mn, mx, n) for mn, mx, n in
            zip(cfg.xyz_min, cfg.xyz_max, mc_shape)]
    xyz = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1)
    density = params.density(xyz)[..., 0]
    alpha = alpha_ops.raw2alpha(density, 0.0, cfg.voxel_size_ratio)
    pooled = interp.max_pool_3d_same(alpha)
    new_mask = params.mask_cache.mask & (pooled > cfg.fast_color_thres)
    return params.replace(mask_cache=params.mask_cache.replace(mask=new_mask))
