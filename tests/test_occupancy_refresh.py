"""Chunked occupancy refresh (models/fourier_grid._dense_alpha_chunked):
slab-chunked dense alpha must equal the one-shot meshgrid evaluation, and
scale_volume_grid must refresh the mask for any grid size (the round-1
silent 256^3 cap is gone)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models import fourier_grid as fg


def _params_cfg():
    cfg = fg.FourierGridConfig(
        scene_center=(0.0, 0.0, 0.0),
        scene_radius=(1.0, 1.0, 1.0),
        num_voxels_density=20**3,
        num_voxels_rgb=20**3,
        num_voxels_base_density=20**3,
        num_voxels_base_rgb=20**3,
        alpha_init=1e-2,
        # around the median alpha of the noised density, so the refreshed
        # mask is neither empty nor full
        fast_color_thres=1.5e-2,
        fourier_freq_num=2,
        rgbnet_dim=4,
    )
    params = fg.create(cfg, jax.random.PRNGKey(0))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid
            + jax.random.normal(jax.random.PRNGKey(1), params.density.grid.shape)
        )
    )
    return params, cfg


@pytest.mark.slow
def test_chunked_alpha_matches_one_shot():
    params, cfg = _params_cfg()
    ws = cfg.world_size_density
    # one-shot reference
    axes = [jnp.linspace(mn, mx, n) for mn, mx, n in
            zip(cfg.xyz_min, cfg.xyz_max, ws)]
    xyz = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1)
    ref = fg.activate_density(params, cfg, params.density(xyz)[..., 0])
    # tiny slabs force both the chunking and the padding path
    got = fg._dense_alpha_chunked(params, cfg, ws, max_pts_per_slab=3 * ws[1] * ws[2])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_scale_volume_grid_always_refreshes_mask():
    params, cfg = _params_cfg()
    # upscale: with the informative density, the refreshed mask must drop
    # some voxels (it is an AND with the alpha threshold)
    params2, cfg2 = fg.scale_volume_grid(params, cfg, 24**3, 24**3)
    frac = float(jnp.mean(params2.mask_cache.mask.astype(jnp.float32)))
    assert params2.mask_cache.mask.shape == cfg2.world_size_density
    assert 0.0 < frac < 1.0
