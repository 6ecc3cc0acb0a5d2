"""Hierarchical occupancy probe + occupancy-adaptive budgets (VERDICT r4 #2,
SURVEY §7.3 sparse path).

Gates:
- conservativeness: with ample candidate groups the 2-level probe selects
  EXACTLY the flat strided probe's sample set (forward outputs equal);
- truncation contract: an undersized candidate budget drops only the far
  tail, never invents samples;
- suggest_budgets: budgets sized from measured ray statistics reproduce the
  full-march render on a sparse scene.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.models import fourier_grid as fg


def _sparse_model(seed=0, vox=32, n_bumps=3):
    cfg = fg.FourierGridConfig(
        scene_center=(0.0, 0.0, 0.0), scene_radius=(3.0, 3.0, 3.0),
        num_voxels_density=vox**3, num_voxels_rgb=vox**3,
        num_voxels_base_density=vox**3, num_voxels_base_rgb=vox**3,
        alpha_init=1e-2, fast_color_thres=1e-3, bg_len=0.2,
        fourier_freq_num=2, rgbnet_dim=6, rgbnet_depth=3, rgbnet_width=32,
        stepsize=1.0, t_boundary=2.0, sample_budget=48,
        budget_probe_stride=2,
    )
    params = fg.create(cfg, jax.random.PRNGKey(seed))
    ws = params.density.grid.shape[1:4]
    ax = [jnp.linspace(-1, 1, n) for n in ws]
    xyz = jnp.stack(jnp.meshgrid(*ax, indexing="ij"), -1)
    rng = np.random.default_rng(seed)
    bump = -4.0 * jnp.ones(ws)
    for _ in range(n_bumps):  # a few small blobs -> sparse occupancy
        c = jnp.asarray(rng.uniform(-0.6, 0.6, 3), jnp.float32)
        bump = bump + 10.0 * jnp.exp(-jnp.sum((xyz - c) ** 2, -1) / 0.01)
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid + bump[None, ..., None]
        )
    )
    params = fg.update_occupancy_cache(params, cfg)
    return cfg, params


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    origins = 2.6 * origins / np.linalg.norm(origins, axis=-1, keepdims=True)
    target = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = target - origins
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(d), jnp.asarray(d)


def test_hierarchical_probe_matches_flat():
    cfg, params = _sparse_model()
    occ = float(jnp.mean(params.mask_cache.mask.astype(jnp.float32)))
    assert occ < 0.45, f"fixture not sparse (occupancy {occ:.2f})"
    ro, rd, vd = _rays(256)
    S = 2 * cfg.n_inner
    # ample candidates: every group can be a candidate -> selection must be
    # IDENTICAL to the flat probe's (conservative coarse never drops a
    # fine-accepted sample)
    cfg_h = dataclasses.replace(
        cfg, probe_coarse_stride=8, probe_candidate_groups=-(-S // 8)
    )
    res_f = fg.forward(params, cfg, ro, rd, vd, bg=1.0)
    res_h = fg.forward(params, cfg_h, ro, rd, vd, bg=1.0)
    np.testing.assert_array_equal(np.asarray(res_h.t), np.asarray(res_f.t))
    np.testing.assert_array_equal(
        np.asarray(res_h.mask), np.asarray(res_f.mask)
    )
    np.testing.assert_allclose(
        np.asarray(res_h.rgb_marched), np.asarray(res_f.rgb_marched),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(res_h.depth), np.asarray(res_f.depth), atol=1e-6
    )


def test_hierarchical_probe_auto_candidates_sparse():
    """On a sparse scene the AUTO candidate budget (1.5x sample_budget / cs)
    already reproduces the flat render for almost every ray — the practical
    configuration the bench ships."""
    cfg, params = _sparse_model(seed=2)
    ro, rd, vd = _rays(512, seed=3)
    cfg_h = dataclasses.replace(cfg, probe_coarse_stride=8)
    res_f = fg.forward(params, cfg, ro, rd, vd, bg=1.0)
    res_h = fg.forward(params, cfg_h, ro, rd, vd, bg=1.0)
    same = np.isclose(
        np.asarray(res_h.rgb_marched), np.asarray(res_f.rgb_marched),
        atol=1e-6,
    ).all(-1)
    assert same.mean() > 0.98, f"only {same.mean():.3f} of rays match"


def test_candidate_truncation_drops_far_tail_only():
    cfg, params = _sparse_model(seed=4, n_bumps=6)
    ro, rd, vd = _rays(128, seed=5)
    cfg_h = dataclasses.replace(
        cfg, probe_coarse_stride=8, probe_candidate_groups=2
    )
    pts, _, t = fg.sample_ray(cfg, ro, rd)
    sel_f, m_f = fg.budget_select(params, cfg, pts, ro, rd, t)
    sel_h, m_h = fg.budget_select(params, cfg_h, pts, ro, rd, t)
    sf = np.asarray(sel_f)
    sh = np.asarray(sel_h)
    mf = np.asarray(m_f)
    mh = np.asarray(m_h)
    for i in range(sf.shape[0]):
        a = sf[i][mf[i]]
        b = sh[i][mh[i]]
        # truncated selection is a PREFIX of the flat one (far tail dropped)
        assert b.size <= a.size
        np.testing.assert_array_equal(b, a[: b.size])


def test_suggest_budgets_reproduces_full_march():
    cfg, params = _sparse_model(seed=6)
    ro, rd, vd = _rays(2048, seed=7)
    rec = fg.suggest_budgets(params, cfg, ro, rd, vd, chunk=512)
    S = 2 * cfg.n_inner
    assert 16 <= rec["sample_budget"] <= S
    assert 8 <= rec["color_budget"] <= rec["sample_budget"]
    # budgeted render vs full march on held-out rays
    ro2, rd2, vd2 = _rays(512, seed=8)
    cfg_full = dataclasses.replace(cfg, sample_budget=0)
    cfg_b = dataclasses.replace(
        cfg, sample_budget=rec["sample_budget"], probe_coarse_stride=8
    )
    res_full = fg.forward(params, cfg_full, ro2, rd2, vd2, bg=1.0)
    res_b = fg.forward(params, cfg_b, ro2, rd2, vd2, bg=1.0)
    mse = float(
        np.mean(
            (np.asarray(res_full.rgb_marched) - np.asarray(res_b.rgb_marched))
            ** 2
        )
    )
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 45.0, f"adaptive-budget render diverges: {psnr:.1f} dB"
