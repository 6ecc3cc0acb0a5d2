"""Model-family forward smoke + invariants on the virtual CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.configs.schema import ModelRenderConfig


def _mr(**kw):
    base = dict(
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
    )
    base.update(kw)
    return ModelRenderConfig(**base)


def _rays(n=8):
    ro = jnp.ones((n, 3)) * 2.0
    rd = -jnp.ones((n, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


def _check(res, n):
    rgb = np.asarray(res.rgb_marched)
    assert rgb.shape == (n, 3)
    assert np.isfinite(rgb).all()
    w = np.asarray(res.weights)
    last = np.asarray(res.alphainv_last)
    # conservation: sum(weights) + final transmittance ≈ 1 (within early-exit slack)
    total = w.sum(-1) + last
    assert np.all(total <= 1.0 + 1e-4)
    assert np.all(total >= 1.0 - 2e-3)


@pytest.mark.slow
def test_dvgo_forward_conservation():
    from unboundednerfpytorch_tpu.models import dvgo

    cfg = dvgo.DVGOConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
        num_voxels=20**3, num_voxels_base=20**3, rgbnet_dim=6, alpha_init=1e-2,
        fast_color_thres=0.0,
    )
    params = dvgo.create(cfg, jax.random.PRNGKey(0))
    params = params.replace(density=params.density.replace(
        grid=jnp.abs(jax.random.normal(jax.random.PRNGKey(3), params.density.grid.shape)) * 3
    ))
    ro, rd, vd = _rays()
    res = dvgo.forward(params, cfg, ro, rd, vd, near=0.5, stepsize=0.5, bg=1.0)
    _check(res, 8)


def test_dcvgo_forward():
    from unboundednerfpytorch_tpu.models import dcvgo

    cfg = dcvgo.config_from(_mr(), (-3, -3, -3), (3, 3, 3), 20**3)
    params = dcvgo.create(cfg, jax.random.PRNGKey(0))
    ro, rd, vd = _rays()
    res = dcvgo.forward(params, cfg, ro, rd, vd, bg=1.0)
    _check(res, 8)
    assert res.n_max == 2 * cfg.n_inner


def test_fourier_grid_forward_and_banks():
    from unboundednerfpytorch_tpu.models import fourier_grid as fg

    cfg = fg.config_from(_mr(), (-3, -3, -3), (3, 3, 3), 20**3, 20**3)
    params = fg.create(cfg, jax.random.PRNGKey(0))
    assert params.density.num_banks == 2 * cfg.fourier_freq_num + 1
    ro, rd, vd = _rays()
    res = fg.forward(params, cfg, ro, rd, vd)
    _check(res, 8)


def test_fourier_grid_view_grid_and_embeddings():
    from unboundednerfpytorch_tpu.models import fourier_grid as fg

    cfg = fg.config_from(
        _mr(num_voxels_viewdir=16**3, img_emb_dim=4),
        (-3, -3, -3), (3, 3, 3), 20**3, 20**3, sample_num=5,
    )
    params = fg.create(cfg, jax.random.PRNGKey(0))
    assert params.vd is not None
    ro, rd, vd = _rays()
    res = fg.forward(params, cfg, ro, rd, vd, img_index=jnp.zeros((8,), jnp.int32))
    _check(res, 8)


def test_dmpigo_forward():
    from unboundednerfpytorch_tpu.models import dmpigo

    cfg = dmpigo.config_from(
        _mr(mpi_depth=32), (-1.5, -1.6, 0.0), (1.5, 1.6, 1.0), 24**3
    )
    params = dmpigo.create(cfg, jax.random.PRNGKey(0))
    n = 8
    ro = jnp.zeros((n, 3))
    rd = jnp.concatenate([jnp.zeros((n, 2)), jnp.ones((n, 1))], -1)
    res = dmpigo.forward(params, cfg, ro, rd, rd, bg=1.0)
    _check(res, n)
    # initial equal-alpha design: with zero density grid, per-plane alpha
    # should make weights roughly uniform over depth (dmpigo.py:47-57)
    w = np.asarray(res.weights)[0]
    live = w[np.asarray(res.mask)[0]]
    assert live.std() / (live.mean() + 1e-9) < 0.3


@pytest.mark.slow
def test_scale_volume_grid_families():
    from unboundednerfpytorch_tpu.models import dcvgo, fourier_grid as fg

    cfg = dcvgo.config_from(_mr(), (-3, -3, -3), (3, 3, 3), 16**3)
    params = dcvgo.create(cfg, jax.random.PRNGKey(0))
    params2, cfg2 = dcvgo.scale_volume_grid(params, cfg, 24**3)
    assert max(cfg2.world_size) > max(cfg.world_size)
    assert params2.density.grid.shape[:3] == cfg2.world_size

    cfgf = fg.config_from(_mr(), (-3, -3, -3), (3, 3, 3), 16**3, 16**3)
    pf = fg.create(cfgf, jax.random.PRNGKey(1))
    pf2, cfgf2 = fg.scale_volume_grid(pf, cfgf, 24**3, 24**3)
    assert pf2.density.grid.shape[1:4] == cfgf2.world_size_density


def test_dvgo_packed_render_cache_parity():
    """dvgo.forward with the packed fused cache must match the plain path."""
    import jax

    from unboundednerfpytorch_tpu.models import dvgo as dv

    cfg = dv.DVGOConfig(
        xyz_min=(-1.0, -1.0, -1.0), xyz_max=(1.0, 1.0, 1.0),
        num_voxels=24**3, num_voxels_base=24**3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=6,
    )
    params = dv.create(cfg, jax.random.PRNGKey(0))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid
            + jax.random.normal(jax.random.PRNGKey(1), params.density.grid.shape)
        ),
        k0=params.k0.replace(
            grid=params.k0.grid
            + jax.random.normal(jax.random.PRNGKey(2), params.k0.grid.shape)
        ),
    )
    cache = dv.build_render_cache(params, cfg)
    assert cache is not None
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    ro = jax.random.uniform(k1, (48, 3), minval=1.5, maxval=2.5)
    rd = -ro + 0.1 * jax.random.normal(k2, (48, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ref = dv.forward(params, cfg, ro, rd, vd, near=0.2, stepsize=0.5, bg=1.0)
    got = dv.forward(params, cfg, ro, rd, vd, near=0.2, stepsize=0.5, bg=1.0,
                     cache=cache)
    np.testing.assert_allclose(
        np.asarray(got.rgb_marched), np.asarray(ref.rgb_marched),
        atol=2e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.weights), np.asarray(ref.weights), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_dcvgo_and_dmpigo_packed_render_cache_parity():
    import jax

    from unboundednerfpytorch_tpu.models import dcvgo as dc
    from unboundednerfpytorch_tpu.models import dmpigo as dm

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    ro = jax.random.uniform(k1, (32, 3), minval=1.2, maxval=2.0)
    rd = -ro + 0.1 * jax.random.normal(k2, (32, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    ccfg = dc.DCVGOConfig(
        scene_center=(0.0, 0.0, 0.0), scene_radius=(1.0, 1.0, 1.0),
        num_voxels=20**3, num_voxels_base=20**3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_depth=2,
        rgbnet_width=16, stepsize=1.0,
    )
    cp = dc.create(ccfg, key)
    cp = cp.replace(density=cp.density.replace(
        grid=cp.density.grid + jax.random.normal(k1, cp.density.grid.shape)))
    cc = dc.build_render_cache(cp, ccfg)
    assert cc is not None
    ref = dc.forward(cp, ccfg, ro, rd, vd, bg=1.0)
    got = dc.forward(cp, ccfg, ro, rd, vd, bg=1.0, cache=cc)
    np.testing.assert_allclose(np.asarray(got.rgb_marched),
                               np.asarray(ref.rgb_marched), atol=2e-5, rtol=1e-5)

    mcfg = dm.DMPIGOConfig(
        xyz_min=(-1.0, -1.0, 0.0), xyz_max=(1.0, 1.0, 1.0),
        num_voxels=20 * 20 * 32, mpi_depth=32, fast_color_thres=1e-4,
        rgbnet_dim=4, rgbnet_depth=2, rgbnet_width=16, stepsize=1.0,
    )
    mp = dm.create(mcfg, key)
    mp = mp.replace(density=mp.density.replace(
        grid=mp.density.grid + jax.random.normal(k2, mp.density.grid.shape)))
    mc = dm.build_render_cache(mp, mcfg)
    assert mc is not None
    ro2 = jnp.stack([ro[:, 0] * 0.1, ro[:, 1] * 0.1, -jnp.ones(32) * 1.0], -1)
    rd2 = jnp.stack([rd[:, 0] * 0.05, rd[:, 1] * 0.05, jnp.ones(32)], -1)
    vd2 = rd2 / jnp.linalg.norm(rd2, axis=-1, keepdims=True)
    ref = dm.forward(mp, mcfg, ro2, rd2, vd2, bg=1.0)
    got = dm.forward(mp, mcfg, ro2, rd2, vd2, bg=1.0, cache=mc)
    np.testing.assert_allclose(np.asarray(got.rgb_marched),
                               np.asarray(ref.rgb_marched), atol=2e-5, rtol=1e-5)
