"""Baked fast-render mode (fourier_grid.bake_for_rendering): single-bank
export must render close to the exact multi-bank field, and exactly match
it when the field has no high-frequency banks to lose."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models import fourier_grid as fg


def _model(num_freqs=2, n=24, seed=0, noise=0.3):
    cfg = fg.FourierGridConfig(
        scene_center=(0.0, 0.0, 0.0),
        scene_radius=(1.0, 1.0, 1.0),
        num_voxels_density=n**3,
        num_voxels_rgb=n**3,
        num_voxels_base_density=n**3,
        num_voxels_base_rgb=n**3,
        alpha_init=1e-2,
        fast_color_thres=1e-4,
        fourier_freq_num=num_freqs,
        rgbnet_dim=6,
        stepsize=1.0,
    )
    params = fg.create(cfg, jax.random.PRNGKey(seed))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid
            + noise * jax.random.normal(
                jax.random.PRNGKey(seed + 1), params.density.grid.shape
            )
        ),
        k0=params.k0.replace(
            grid=params.k0.grid
            + noise * jax.random.normal(
                jax.random.PRNGKey(seed + 2), params.k0.grid.shape
            )
        ),
    )
    return params, cfg


def _rays(n, key):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    ro = jax.random.uniform(k1, (n, 3), minval=1.2, maxval=2.0)
    rd = -ro + 0.1 * jax.random.normal(k2, (n, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


@pytest.mark.slow
def test_bake_is_exact_for_single_bank_field():
    """With num_freqs=0 the bake at scale 1 is a pure lattice resample of a
    trilinear field onto its own nodes — identical renders."""
    params, cfg = _model(num_freqs=0)
    baked, bcfg = fg.bake_for_rendering(params, cfg, scale=1.0)
    ro, rd, vd = _rays(32, 5)
    r_exact = fg.forward(params, cfg, ro, rd, vd, bg=1.0)
    r_baked = fg.forward(baked, bcfg, ro, rd, vd, bg=1.0)
    np.testing.assert_allclose(
        np.asarray(r_baked.rgb_marched), np.asarray(r_exact.rgb_marched),
        atol=2e-5, rtol=1e-5,
    )


@pytest.mark.slow
def test_bake_approximates_multi_bank_field():
    params, cfg = _model(num_freqs=2)
    baked, bcfg = fg.bake_for_rendering(params, cfg, scale=1.6)
    assert baked.density.grid.shape[0] == 1  # single bank
    assert bcfg.fourier_freq_num == 0
    ro, rd, vd = _rays(64, 7)
    r_exact = fg.forward(params, cfg, ro, rd, vd, bg=1.0)
    r_baked = fg.forward(baked, bcfg, ro, rd, vd, bg=1.0)
    err = np.mean(
        (np.asarray(r_baked.rgb_marched) - np.asarray(r_exact.rgb_marched)) ** 2
    )
    psnr = -10 * np.log10(max(err, 1e-12))
    # random grids are the worst case for resampling; a trained (smooth)
    # field bakes far tighter
    assert psnr > 25.0, psnr
    # carried-over state untouched
    assert baked.rgbnet is params.rgbnet
    np.testing.assert_array_equal(
        np.asarray(baked.mask_cache.mask), np.asarray(params.mask_cache.mask)
    )
