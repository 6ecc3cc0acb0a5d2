"""Two-stage render engine parity: the split density/color cached path must
match the single-stage forward exactly whenever no ray exceeds the
color_budget (models/fourier_grid._forward_two_stage)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models import fourier_grid as fg


def _cfg(**kw):
    base = dict(
        scene_center=(0.0, 0.0, 0.0),
        scene_radius=(1.0, 1.0, 1.0),
        num_voxels_density=32**3,
        num_voxels_rgb=32**3,
        num_voxels_base_density=32**3,
        num_voxels_base_rgb=32**3,
        alpha_init=1e-2,
        fast_color_thres=1e-4,
        fourier_freq_num=3,
        rgbnet_dim=6,
        bg_len=0.2,
        stepsize=1.0,
        sample_budget=0,
    )
    base.update(kw)
    return fg.FourierGridConfig(**base)


def _rays(n, key):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    ro = jax.random.uniform(k1, (n, 3), minval=1.2, maxval=2.0)
    rd = -ro + 0.1 * jax.random.normal(k2, (n, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


@pytest.mark.parametrize("budget", [pytest.param(0, marks=pytest.mark.slow), 48])
def test_two_stage_matches_single_stage(budget):
    cfg1 = _cfg(sample_budget=budget)
    params = fg.create(cfg1, jax.random.PRNGKey(0))
    # make density informative so weights are nontrivial
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid
            + 0.5 * jax.random.normal(
                jax.random.PRNGKey(3), params.density.grid.shape
            )
        )
    )
    ro, rd, vd = _rays(64, 1)

    res1 = fg.forward(params, cfg1, ro, rd, vd, bg=1.0)

    # generous color budget: no ray can exceed it -> exact parity
    cfg2 = dataclasses.replace(cfg1, color_budget=res1.weights.shape[-1])
    cache = fg.build_render_cache(params, cfg2)
    assert cache is not None and cache.density_tables is not None
    res2 = fg.forward(params, cfg2, ro, rd, vd, bg=1.0, cache=cache)

    np.testing.assert_allclose(
        np.asarray(res2.rgb_marched), np.asarray(res1.rgb_marched),
        atol=2e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res2.depth), np.asarray(res1.depth), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res2.alphainv_last), np.asarray(res1.alphainv_last),
        atol=2e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res2.weights), np.asarray(res1.weights), atol=2e-5,
        rtol=1e-5,
    )


@pytest.mark.slow
def test_density_bake_is_close_and_observable():
    """density_bake_scale: the render-only density bake must (a) build a
    single-bank folded table at scaled dims, (b) render within a tight PSNR
    of the exact two-stage path on a smooth trained-scale field, and (c) be
    exact for single-frequency content the lattice can represent."""
    cfg1 = _cfg(sample_budget=0)
    params = fg.create(cfg1, jax.random.PRNGKey(0))
    # smooth, informative density (trained fields are band-limited-ish)
    ws = params.density.grid.shape[1:4]
    ax = [jnp.linspace(0, 2 * np.pi, n) for n in ws]
    gx, gy, gz = jnp.meshgrid(*ax, indexing="ij")
    smooth = 1.5 * jnp.sin(gx) * jnp.cos(gy) * jnp.sin(gz)
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid + smooth[None, ..., None]
        )
    )
    ro, rd, vd = _rays(96, 4)

    cfg2 = dataclasses.replace(cfg1, color_budget=64)
    cache_exact = fg.build_render_cache(params, cfg2)
    res_exact = fg.forward(params, cfg2, ro, rd, vd, bg=1.0, cache=cache_exact)

    cfg3 = dataclasses.replace(cfg2, density_bake_scale=2.0)
    cache_baked = fg.build_render_cache(params, cfg3)
    assert len(cache_baked.density_tables) == 1
    assert cache_baked.density_num_freqs == 0
    assert cache_baked.density_dims is not None
    assert cache_baked.density_dims[0] > params.density.grid.shape[1]
    res_baked = fg.forward(params, cfg3, ro, rd, vd, bg=1.0, cache=cache_baked)

    err = float(jnp.mean((res_baked.rgb_marched - res_exact.rgb_marched) ** 2))
    psnr = -10.0 * np.log10(max(err, 1e-12))
    assert psnr > 38.0, f"density-bake PSNR vs exact too low: {psnr:.1f} dB"

    # color path untouched: k0 tables identical between the two caches
    for a, b in zip(cache_exact.k0_tables, cache_baked.k0_tables):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # bf16 bake (VERDICT r4 #7): halves the baked density pass's bytes/row;
    # must stay within ~0.5 dB of the f32 bake on this field (bandwidth win
    # measured on TPU by bench.py)
    cfg4 = dataclasses.replace(cfg3, density_bake_dtype="bfloat16")
    cache_bf16 = fg.build_render_cache(params, cfg4)
    assert cache_bf16.density_tables[0].dtype == jnp.bfloat16
    res_bf16 = fg.forward(params, cfg4, ro, rd, vd, bg=1.0, cache=cache_bf16)
    err16 = float(jnp.mean((res_bf16.rgb_marched - res_exact.rgb_marched) ** 2))
    psnr16 = -10.0 * np.log10(max(err16, 1e-12))
    assert psnr16 > psnr - 0.5, (
        f"bf16 bake quantization cost too high: {psnr16:.1f} vs {psnr:.1f} dB"
    )


@pytest.mark.slow
def test_two_stage_truncation_is_tail_only():
    """With a tiny color budget, the two-stage result equals compositing only
    each ray's first `cb` surviving samples (near->far order preserved)."""
    cfg1 = _cfg()
    params = fg.create(cfg1, jax.random.PRNGKey(0))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid + 1.0
        )
    )
    ro, rd, vd = _rays(32, 2)
    res1 = fg.forward(params, cfg1, ro, rd, vd, bg=0.0)

    cb = 4
    cfg2 = dataclasses.replace(cfg1, color_budget=cb)
    cache = fg.build_render_cache(params, cfg2)
    res2 = fg.forward(params, cfg2, ro, rd, vd, bg=0.0, cache=cache)

    # stage-1 outputs identical
    np.testing.assert_allclose(
        np.asarray(res2.weights), np.asarray(res1.weights), atol=2e-5,
        rtol=1e-5,
    )
    # rgb energy of the two-stage composite is <= single-stage + bg term and
    # matches the manual first-cb-survivors composite
    w = np.asarray(res1.weights)
    mask = np.asarray(res1.mask)
    rgbs = np.asarray(res1.raw_rgb)
    manual = np.zeros((w.shape[0], 3))
    for r in range(w.shape[0]):
        idx = np.nonzero(mask[r])[0][:cb]
        manual[r] = (w[r, idx, None] * rgbs[r, idx]).sum(0)
    np.testing.assert_allclose(
        np.asarray(res2.rgb_marched), manual, atol=3e-5, rtol=1e-4
    )


def test_two_stage_cache_with_zero_thres_falls_back_exactly():
    """A two-stage cache rendered with fast_color_thres<=0 must fall through
    to the single-stage path WITHOUT dereferencing the (None) fused tables —
    and match the cache-less forward exactly (regression: the thres gate
    previously sent this into the packed branch and crashed)."""
    cfg1 = _cfg(fast_color_thres=0.0)
    params = fg.create(cfg1, jax.random.PRNGKey(0))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid
            + 0.5 * jax.random.normal(
                jax.random.PRNGKey(3), params.density.grid.shape
            )
        )
    )
    ro, rd, vd = _rays(32, 2)
    cfg2 = dataclasses.replace(cfg1, color_budget=48)
    cache = fg.build_render_cache(params, cfg2)
    assert cache.tables is None  # two-stage layout: fused tables absent
    res_nc = fg.forward(params, cfg1, ro, rd, vd, bg=1.0)
    res_c = fg.forward(params, cfg2, ro, rd, vd, bg=1.0, cache=cache,
                       fast_color_thres=0.0)
    np.testing.assert_allclose(
        np.asarray(res_c.rgb_marched), np.asarray(res_nc.rgb_marched),
        rtol=1e-5, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# two-stage TRAINING forward (train_survivor_budget)
# ---------------------------------------------------------------------------


def _sparse_params(cfg):
    """Params with a localized density bump (so the fast_color_thres keeps a
    handful of samples per ray and no ray overflows the survivor budget)."""
    params = fg.create(cfg, jax.random.PRNGKey(0))
    ws = params.density.grid.shape[1:4]
    ax = [jnp.linspace(-1, 1, n) for n in ws]
    xyz = jnp.stack(jnp.meshgrid(*ax, indexing="ij"), -1)
    bump = 6.0 * jnp.exp(-jnp.sum(xyz**2, -1) / 0.05) - 4.0
    return params.replace(
        density=params.density.replace(
            grid=params.density.grid + bump[None, ..., None]
        )
    )


def test_train_two_stage_matches_plain_values_and_grads():
    """The two-stage TRAINING forward (stop-grad probe -> survivor
    compaction -> differentiable fused gather) must reproduce the plain
    masked forward's outputs AND parameter gradients exactly when no ray
    overflows the survivor budget — the reference-gradient-exactness claim
    of models/fourier_grid._forward_train_two_stage."""
    cfg1 = _cfg(
        scene_radius=(3.0, 3.0, 3.0), num_voxels_density=24**3,
        num_voxels_rgb=24**3, num_voxels_base_density=24**3,
        num_voxels_base_rgb=24**3, fourier_freq_num=2,
        fast_color_thres=1e-3, stepsize=0.5,
    )
    cfg2 = dataclasses.replace(cfg1, train_survivor_budget=24)
    params = _sparse_params(cfg1)
    k = jax.random.PRNGKey(1)
    ro = jax.random.normal(k, (48, 3)) * 0.3 + jnp.array([2.5, 0.0, 0.0])
    rd = -ro / jnp.linalg.norm(ro, axis=-1, keepdims=True)
    vd = rd

    def run(c, sub):
        p = params.replace(
            density=params.density.replace(grid=sub["d"]),
            k0=params.k0.replace(grid=sub["k"]),
            rgbnet=params.rgbnet.replace(weights=sub["w"]),
        )
        r = fg.forward(p, c, ro, rd, vd)
        loss = (
            jnp.sum(r.rgb_marched**2) + jnp.sum(r.weights) + jnp.sum(r.depth)
        )
        return loss, r

    sub = {"d": params.density.grid, "k": params.k0.grid,
           "w": params.rgbnet.weights}
    (l1, r1), g1 = jax.value_and_grad(lambda s: run(cfg1, s), has_aux=True)(sub)
    (l2, r2), g2 = jax.value_and_grad(lambda s: run(cfg2, s), has_aux=True)(sub)

    # the branch actually compacted (shape proves the two-stage path ran)
    assert r2.weights.shape[1] == 24
    assert r1.weights.shape[1] > 24
    assert float(r2.color_overflow_frac) == 0.0

    np.testing.assert_allclose(
        np.asarray(r1.rgb_marched), np.asarray(r2.rgb_marched),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r1.alphainv_last), np.asarray(r2.alphainv_last),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for name in ("d", "k"):
        np.testing.assert_allclose(
            np.asarray(g1[name]), np.asarray(g2[name]), rtol=2e-4, atol=1e-6
        )
    for a, b in zip(g1["w"], g2["w"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_train_two_stage_inactive_below_thres_gate():
    """Below train_two_stage_thres the plain path must run (early-training
    thresholds pass nearly every sample; a fixed budget would truncate)."""
    cfg1 = _cfg(
        scene_radius=(3.0, 3.0, 3.0), num_voxels_density=24**3,
        num_voxels_rgb=24**3, num_voxels_base_density=24**3,
        num_voxels_base_rgb=24**3, fourier_freq_num=2,
        fast_color_thres=5e-6, stepsize=0.5,
    )
    cfg2 = dataclasses.replace(cfg1, train_survivor_budget=24)
    params = _sparse_params(cfg1)
    ro, rd, vd = _rays(16, 5)
    r = fg.forward(params, cfg2, ro, rd, vd)
    assert r.weights.shape[1] > 24  # full-shape: branch did NOT compact
