"""Adaptive ray pruning (fourier_grid.render_rays_adaptive): exact parity
with the two-stage cached forward for every survivor-bucket size."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models import fourier_grid as fg

pytestmark = pytest.mark.slow


def _model(seed=0):
    cfg = fg.FourierGridConfig(
        scene_center=(0.0, 0.0, 0.0),
        scene_radius=(1.0, 1.0, 1.0),
        num_voxels_density=32**3,
        num_voxels_rgb=32**3,
        num_voxels_base_density=32**3,
        num_voxels_base_rgb=32**3,
        alpha_init=1e-2,
        fast_color_thres=1e-4,
        fourier_freq_num=2,
        rgbnet_dim=6,
        stepsize=1.0,
        sample_budget=48,
        color_budget=16,
    )
    params = fg.create(cfg, jax.random.PRNGKey(seed))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid
            + jax.random.normal(jax.random.PRNGKey(seed + 1),
                                params.density.grid.shape)
        )
    )
    return params, cfg


def _rays(n, key):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    ro = jax.random.uniform(k1, (n, 3), minval=1.2, maxval=2.0)
    rd = -ro + 0.1 * jax.random.normal(k2, (n, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


def test_adaptive_matches_two_stage():
    params, cfg = _model()
    cache = fg.build_render_cache(params, cfg)
    assert cache is not None and cache.density_tables is not None
    ro, rd, vd = _rays(64, 3)

    ref = fg.forward(params, cfg, ro, rd, vd, bg=1.0, cache=cache)
    rgb, depth, bgw = fg.render_rays_adaptive(
        params, cfg, cache, ro, rd, vd, bg=1.0, seg=16
    )
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(ref.rgb_marched), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(depth), np.asarray(ref.depth), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bgw), np.asarray(ref.alphainv_last), atol=3e-5, rtol=1e-4
    )


def test_adaptive_exact_when_all_rays_die_early():
    """Opaque scene: every ray saturates inside the first segment, so phase B
    runs at the smallest bucket — result must still match."""
    params, cfg = _model()
    params = params.replace(
        density=params.density.replace(grid=params.density.grid + 6.0)
    )
    cache = fg.build_render_cache(params, cfg)
    ro, rd, vd = _rays(64, 9)
    ref = fg.forward(params, cfg, ro, rd, vd, bg=0.0, cache=cache)
    rgb, depth, bgw = fg.render_rays_adaptive(
        params, cfg, cache, ro, rd, vd, bg=0.0, seg=16
    )
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(ref.rgb_marched), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bgw), np.asarray(ref.alphainv_last), atol=3e-5, rtol=1e-4
    )
