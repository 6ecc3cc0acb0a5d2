"""Staged constant-baked renderer (render/staged_const.py): per-bank
constant executables must reproduce the cached two-stage render path
exactly (same math, different packaging)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.models import fourier_grid as fg
from unboundednerfpytorch_tpu.render import renderer, staged_const

pytestmark = pytest.mark.slow


def test_staged_const_matches_two_stage_cache():
    cfg = fg.FourierGridConfig(
        scene_center=(0.0, 0.0, 0.0), scene_radius=(3.0, 3.0, 3.0),
        num_voxels_density=32**3, num_voxels_rgb=32**3,
        num_voxels_base_density=32**3, num_voxels_base_rgb=32**3,
        alpha_init=1e-2, fast_color_thres=1e-3, bg_len=0.2,
        fourier_freq_num=2, rgbnet_dim=6, rgbnet_depth=3, rgbnet_width=32,
        stepsize=1.0, t_boundary=2.0, sample_budget=48,
        budget_probe_stride=2, color_budget=24,
    )
    params = fg.create(cfg, jax.random.PRNGKey(0))
    ws = params.density.grid.shape[1:4]
    ax = [jnp.linspace(-1, 1, n) for n in ws]
    xyz = jnp.stack(jnp.meshgrid(*ax, indexing="ij"), -1)
    bump = 6.0 * jnp.exp(-jnp.sum(xyz**2, -1) / 0.08) - 3.0
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid + bump[None, ..., None]
        )
    )
    params = fg.update_occupancy_cache(params, cfg)

    H = W = 40
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    pose = synthetic.look_at_pose(
        np.array([2.6, 0.3, 0.9]), np.zeros(3))[:3, :4]

    cache = fg.build_render_cache(params, cfg)
    assert cache is not None and cache.density_tables is not None

    def fwd(aux, ro, rd, vd):
        return fg.forward(aux[0], cfg, ro, rd, vd, bg=1.0, cache=aux[1])

    rgb_ref, depth_ref, bg_ref = renderer.render_image(
        fwd, H, W, K, pose, aux=(params, cache), chunk=800
    )
    render = staged_const.make_staged_renderer(
        params, cfg, cache, H, W, block=800
    )
    rgb_s, depth_s, bg_s = render(K, pose, bg=1.0)
    np.testing.assert_allclose(rgb_s, rgb_ref, atol=2e-5)
    np.testing.assert_allclose(depth_s, depth_ref, atol=2e-5)
    np.testing.assert_allclose(bg_s, bg_ref, atol=2e-5)

    # row-range constant splitting (the relay compile transport rejects
    # >~0.5GB request bodies; big tables ship as several sub-programs):
    # force a cap sized off the k0 tables so every stage-D k0 bank splits
    # into multiple ranges — must still be exact (out-of-range samples
    # contribute masked zeros). The folded density tables are far smaller,
    # so THIS cap leaves stage B unsplit — covered separately below.
    render_split = staged_const.make_staged_renderer(
        params, cfg, cache, H, W, block=800,
        const_max_bytes=max(
            cache.k0_tables[0].shape[1] * cache.k0_tables[0].dtype.itemsize,
            cache.density_tables[0].shape[1]
            * cache.density_tables[0].dtype.itemsize,
        ) * (cache.k0_tables[0].shape[0] // 3),
    )
    rgb_p, depth_p, bg_p = render_split(K, pose, bg=1.0)
    np.testing.assert_allclose(rgb_p, rgb_ref, atol=2e-5)
    np.testing.assert_allclose(depth_p, depth_ref, atol=2e-5)
    np.testing.assert_allclose(bg_p, bg_ref, atol=2e-5)

    # stage-B split coverage (ADVICE r4): a cap sized off the DENSITY
    # tables forces the folded density banks into multiple row ranges,
    # exercising the fold-offset local indexing (base - fr0*fold) that the
    # k0-sized cap above never reaches. k0 banks split into many more
    # ranges under this cap — still exact, just more sub-programs.
    d_rows = cache.density_tables[0].shape[0]
    assert d_rows >= 3, "fixture too small to force a density split"
    render_dsplit = staged_const.make_staged_renderer(
        params, cfg, cache, H, W, block=800,
        const_max_bytes=(
            cache.density_tables[0].shape[1]
            * cache.density_tables[0].dtype.itemsize
        ) * (d_rows // 3),
    )
    rgb_d, depth_d, bg_d = render_dsplit(K, pose, bg=1.0)
    np.testing.assert_allclose(rgb_d, rgb_ref, atol=2e-5)
    np.testing.assert_allclose(depth_d, depth_ref, atol=2e-5)
    np.testing.assert_allclose(bg_d, bg_ref, atol=2e-5)
