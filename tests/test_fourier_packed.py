"""FourierGrid model through the packed gather engine: forward + gradients
must match the unpacked reference path exactly (the engine is a pure
re-routing of the same math — ops/packed.py), for both the training
(pack-on-the-fly scan) and rendering (pre-packed cache) variants."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.configs.schema import ModelRenderConfig
from unboundednerfpytorch_tpu.models import fourier_grid as fg


def _setup(packed: bool, sample_budget: int = 0, probe_stride: int = 1):
    mr = ModelRenderConfig(
        num_voxels_rgb=20**3,
        num_voxels_density=20**3,
        num_voxels_base_rgb=20**3,
        num_voxels_base_density=20**3,
        rgbnet_dim=6,
        alpha_init=1e-2,
        fast_color_thres=1e-4,
        bg_len=0.2,
        fourier_freq_num=2,
        stepsize=1.0,
        sample_budget=sample_budget,
        packed_gather=packed,
        budget_probe_stride=probe_stride,
    )
    cfg = fg.config_from(mr, (-2, -2, -2), (2, 2, 2), 20**3, 20**3)
    params = fg.create(cfg, jax.random.PRNGKey(0))
    # non-trivial grids so the parity check is meaningful
    params = params.replace(
        density=params.density.replace(
            grid=jax.random.normal(jax.random.PRNGKey(1), params.density.grid.shape)
        ),
        k0=params.k0.replace(
            grid=jax.random.normal(jax.random.PRNGKey(2), params.k0.grid.shape)
        ),
    )
    return cfg, params


def _rays(n=16):
    key = jax.random.PRNGKey(7)
    ro = jax.random.uniform(key, (n, 3), minval=1.0, maxval=2.5)
    rd = -ro
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


@pytest.mark.slow
def test_packed_forward_matches_unpacked():
    cfg_u, params = _setup(packed=False)
    cfg_p, _ = _setup(packed=True)
    ro, rd, vd = _rays()

    res_u = fg.forward(params, cfg_u, ro, rd, vd, bg=1.0)
    res_p = fg.forward(params, cfg_p, ro, rd, vd, bg=1.0)
    np.testing.assert_allclose(
        np.asarray(res_p.rgb_marched), np.asarray(res_u.rgb_marched),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_p.weights), np.asarray(res_u.weights),
        rtol=1e-4, atol=1e-5,
    )

    # rendering cache variant
    cache = fg.build_render_cache(params, cfg_p)
    assert cache is not None
    res_c = fg.forward(params, cfg_p, ro, rd, vd, bg=1.0, cache=cache)
    np.testing.assert_allclose(
        np.asarray(res_c.rgb_marched), np.asarray(res_u.rgb_marched),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_packed_gradients_match_unpacked():
    cfg_u, params = _setup(packed=False)
    cfg_p, _ = _setup(packed=True)
    ro, rd, vd = _rays(8)
    target = jax.random.uniform(jax.random.PRNGKey(9), (8, 3))

    def loss(dgrid, kgrid, cfg):
        p = params.replace(
            density=params.density.replace(grid=dgrid),
            k0=params.k0.replace(grid=kgrid),
        )
        res = fg.forward(p, cfg, ro, rd, vd, bg=1.0)
        return jnp.mean((res.rgb_marched - target) ** 2)

    g_u = jax.grad(loss, argnums=(0, 1))(params.density.grid, params.k0.grid, cfg_u)
    g_p = jax.grad(loss, argnums=(0, 1))(params.density.grid, params.k0.grid, cfg_p)
    np.testing.assert_allclose(
        np.asarray(g_p[0]), np.asarray(g_u[0]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_p[1]), np.asarray(g_u[1]), rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow
def test_budget_probe_stride_conservative():
    """With a dilated occupancy cache, the strided probe must select a
    superset-equivalent sample set: rendered output stays close to the
    stride-1 result."""
    cfg1, params = _setup(packed=True, sample_budget=24, probe_stride=1)
    cfg2, _ = _setup(packed=True, sample_budget=24, probe_stride=2)
    # a realistic (dilated) occupancy: pooled random blobs
    from unboundednerfpytorch_tpu.ops import interp

    raw = jax.random.uniform(jax.random.PRNGKey(4), params.mask_cache.mask.shape) < 0.03
    dil = interp.max_pool_3d_same(raw.astype(jnp.float32)) > 0.5
    params = params.replace(mask_cache=params.mask_cache.replace(mask=dil))

    ro, rd, vd = _rays(32)
    r1 = fg.forward(params, cfg1, ro, rd, vd, bg=1.0)
    r2 = fg.forward(params, cfg2, ro, rd, vd, bg=1.0)
    # strided probe keeps every sample the exact probe keeps (conservative),
    # so the compositing difference is bounded by budget-tail effects
    diff = np.abs(np.asarray(r1.rgb_marched) - np.asarray(r2.rgb_marched)).max()
    assert diff < 0.05, f"strided probe diverged: {diff}"
