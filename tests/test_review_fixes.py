"""Regression gates for review findings: per-view intrinsics in the ray
store, FourierGrid near-camera maskout dispatch, sample_budget-preserving
checkpoints, and exact flatten-sampler resume."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.configs.schema import (
    ExpConfig,
    ModelRenderConfig,
    TrainStageConfig,
)
from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.ops import rays as ray_ops
from unboundednerfpytorch_tpu.train import loop


def test_training_rays_use_per_view_intrinsics():
    """Multi-camera rigs carry a different K per view (waymo sample_cam=
    None); the ray store must use each view's own intrinsics (the reference
    passes Ks[i_train] per view, run_train.py:75)."""
    data = synthetic.make_data_dict(n_views=3, H=12, W=12)
    Ks = np.asarray(data["Ks"]).copy()
    Ks[1, 0, 2] += 2.5  # shift view 1's principal point
    Ks[2, 0, 0] *= 1.3  # change view 2's focal
    data["Ks"] = Ks

    cfg = ExpConfig()
    for host in (False, True):
        store = loop.gather_training_rays(cfg, data, host=host)
        rd = np.asarray(store["rays_d"]).reshape(3, 12 * 12, 3)
        for v in range(3):
            _, rd_v, _ = ray_ops.get_rays_of_a_view(
                12, 12, jnp.asarray(Ks[v]),
                jnp.asarray(np.asarray(data["poses"])[v][:3, :4]),
            )
            np.testing.assert_allclose(
                rd[v], np.asarray(rd_v).reshape(-1, 3), atol=1e-6,
                err_msg=f"view {v} host={host}",
            )


def _fg_cfg(n_iters: int, **model_kw) -> ExpConfig:
    return ExpConfig(
        model="FourierGrid",
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=n_iters,
            N_rand=64,
            pervoxel_lr=False,
            pg_scale=(),
            skip_zero_grad_fields=("density", "k0"),
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=16**3,
            num_voxels_density=16**3,
            num_voxels_base_rgb=16**3,
            num_voxels_base_density=16**3,
            rgbnet_dim=0,
            alpha_init=1e-2,
            fast_color_thres=1e-4,
            fourier_freq_num=1,
            bg_len=0.2,
            **model_kw,
        ),
    )


def test_fourier_grid_maskout_near_cam_vox_dispatch(monkeypatch):
    """maskout_near_cam_vox must run for the FourierGrid family too — the
    reference applies it to every model defining it (run_train.py:129-130);
    it was previously gated to family == 'dvgo' only."""
    from unboundednerfpytorch_tpu.models import fourier_grid as fg

    calls = []
    orig = fg.maskout_near_cam_vox

    def spy(params, cfg, cam_o, near_clip):
        calls.append(np.asarray(cam_o).shape)
        return orig(params, cfg, cam_o, near_clip)

    monkeypatch.setattr(fg, "maskout_near_cam_vox", spy)

    data = synthetic.make_data_dict(n_views=3, H=12, W=12)
    cfg = _fg_cfg(2, maskout_near_cam_vox=True)
    loop.run_train(cfg, data, log_fn=lambda s: None)
    assert calls and calls[0][1] == 3, "fg.maskout_near_cam_vox never ran"


def test_checkpoint_preserves_deferred_sample_budget(tmp_path):
    """A checkpoint written while the training-time sample budget is
    deferred (occupancy cache still all-True) must persist the CONFIGURED
    budget, not the deferral-zeroed one — else a resumed run trains without
    the budget forever."""
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

    data = synthetic.make_data_dict(n_views=3, H=12, W=12)
    cfg = _fg_cfg(4, maskout_near_cam_vox=False, sample_budget=8)
    # first pg boundary beyond N_iters: budget stays deferred all run
    cfg = dataclasses.replace(
        cfg, fine_train=dataclasses.replace(cfg.fine_train, pg_scale=(50,))
    )
    exp = str(tmp_path / "exp")
    loop.run_train(cfg, data, exp_dir=exp, log_fn=lambda s: None)
    _, mcfg, _, _, _ = ckpt_mod.load_model(os.path.join(exp, "fine_last"))
    assert mcfg.sample_budget == 8, (
        f"checkpoint lost the deferred sample_budget: {mcfg.sample_budget}"
    )


def test_budget_stays_off_without_occupancy_refresh(tmp_path):
    """With an empty pg_scale and no coarse mask seed the occupancy cache is
    never refreshed from trained density, so the budget must NOT activate
    (it would truncate every ray to its first `budget` samples against an
    all-True cache)."""
    data = synthetic.make_data_dict(n_views=3, H=12, W=12)
    cfg = _fg_cfg(2, maskout_near_cam_vox=False, sample_budget=8)

    steps = []
    _, mcfg_live, _, _ = loop.scene_rep_reconstruction(
        cfg, cfg.fine_model_and_render, cfg.fine_train,
        (-1.2, -1.2, -1.2), (1.2, 1.2, 1.2), data, "fine",
        log_fn=lambda s: None,
        callback=lambda s, m: steps.append(s),
        exp_dir=str(tmp_path / "e"),
    )
    # the budget never activated (no pg boundary, no coarse seed) ...
    assert mcfg_live.sample_budget == 0
    # ... but the saved final checkpoint still carries the configured budget
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

    _, mcfg, _, _, _ = ckpt_mod.load_model(
        os.path.join(str(tmp_path / "e"), "fine_last")
    )
    assert mcfg.sample_budget == 8
    assert len(steps) == 2


@pytest.mark.slow
def test_flatten_sampler_resume_exact(tmp_path):
    """Kill-and-resume with the 'flatten' epoch-permutation sampler must
    reproduce the uninterrupted trajectory — the sampler state is
    reconstructed by replaying the deterministic reshuffle schedule."""

    def cfg(n):
        c = _fg_cfg(n, maskout_near_cam_vox=False)
        # small store + large batch: several reshuffles inside 12 steps
        return dataclasses.replace(
            c, fine_train=dataclasses.replace(
                c.fine_train, ray_sampler="flatten", N_rand=128,
            )
        )

    data = synthetic.make_data_dict(n_views=2, H=12, W=12)

    dir_a = str(tmp_path / "a")
    _, _, params_a, _ = loop.run_train(
        cfg(12), data, exp_dir=dir_a, log_fn=lambda s: None
    )

    dir_b = str(tmp_path / "b")
    loop.run_train(cfg(5), data, exp_dir=dir_b, log_fn=lambda s: None)
    _, _, params_b, _ = loop.run_train(
        cfg(12), data, exp_dir=dir_b, log_fn=lambda s: None
    )

    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.bool_:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=2e-5, atol=2e-6,
            )


def test_host_sampler_fast_forward_matches_stream():
    """fast_forward(n) then next_batch() == the (n+1)-th batch of a fresh
    sampler, for both sampler modes."""
    from unboundednerfpytorch_tpu.train.step import HostRayStoreSampler

    store = {
        "rgb": np.random.default_rng(0).normal(size=(100, 3)),
        "rays_o": np.zeros((100, 3)),
    }
    for mode in ("flatten", "random"):
        ref = HostRayStoreSampler(store, 16, seed=5, mode=mode)
        batches = [ref.next_batch() for _ in range(7)]
        ff = HostRayStoreSampler(store, 16, seed=5, mode=mode)
        ff.fast_forward(6)
        got = ff.next_batch()
        np.testing.assert_array_equal(got["rgb"], batches[6]["rgb"])
