"""Reference-semantics quirks: lr-decay re-anchoring at pg_scale boundaries
(run_train.py:199 rebuilds the optimizer at the base lr), the
FourierGrid-on-tankstemple no-decay quirk (run_train.py:292), and rand_bkgd
reaching the dcvgo/dmpigo training forwards (run_train.py:146 +
dcvgo.py:350 / dmpigo.py:315)."""

import dataclasses

import numpy as np
import pytest

import jax

from unboundednerfpytorch_tpu.configs.schema import (
    ExpConfig,
    DataConfig,
    ModelRenderConfig,
    TrainStageConfig,
)
from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.train import loop


def _tiny_cfg(n_iters: int, pg_scale=(), model="FourierGrid",
              dataset_type="blender", **data_kw) -> ExpConfig:
    return ExpConfig(
        model=model,
        data=DataConfig(dataset_type=dataset_type, **data_kw),
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=n_iters,
            N_rand=64,
            pervoxel_lr=False,
            pg_scale=pg_scale,
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
            maskout_near_cam_vox=False,
        ),
    )


def _record_step_kwargs(monkeypatch):
    """Wrap loop.make_train_step recording (lr_anchor, lr_decay_enabled)."""
    from unboundednerfpytorch_tpu.train.step import make_train_step as real

    calls = []

    def spy(*args, **kwargs):
        calls.append(
            (kwargs.get("lr_anchor", 1), kwargs.get("lr_decay_enabled", True))
        )
        return real(*args, **kwargs)

    monkeypatch.setattr(loop, "make_train_step", spy)
    return calls


def test_lr_decay_reanchors_at_pg_boundary(monkeypatch, tmp_path):
    calls = _record_step_kwargs(monkeypatch)
    data = synthetic.make_data_dict(n_views=2, H=12, W=12)
    cfg = _tiny_cfg(5, pg_scale=(3,))
    loop.run_train(cfg, data, log_fn=lambda s: None)
    anchors = [c[0] for c in calls]
    assert anchors == [1, 3], anchors  # initial compile, then the boundary
    assert all(c[1] for c in calls)  # decay stays enabled


@pytest.mark.slow
def test_lr_decay_resume_reconstructs_anchor(monkeypatch, tmp_path):
    """Resuming past a pg boundary must anchor the decay at that boundary
    (the uninterrupted run's anchor), not at step 1."""
    data = synthetic.make_data_dict(n_views=2, H=12, W=12)
    exp = str(tmp_path / "e")
    loop.run_train(_tiny_cfg(4, pg_scale=(3,)), data, exp_dir=exp,
                   log_fn=lambda s: None)
    calls = _record_step_kwargs(monkeypatch)
    loop.run_train(_tiny_cfg(6, pg_scale=(3,)), data, exp_dir=exp,
                   log_fn=lambda s: None)
    assert [c[0] for c in calls] == [3], calls


def test_no_lr_decay_for_fouriergrid_on_tankstemple(monkeypatch):
    calls = _record_step_kwargs(monkeypatch)
    data = synthetic.make_data_dict(n_views=2, H=12, W=12)
    cfg = _tiny_cfg(2, model="FourierGrid", dataset_type="tankstemple")
    loop.run_train(cfg, data, log_fn=lambda s: None)
    assert calls and not calls[0][1], "decay not disabled for FG+tankstemple"


def test_lr_anchor_shifts_decay_schedule():
    """make_train_step(lr_anchor=k): step k trains at the undecayed base lr.
    Verified through the actual update magnitude of a 1-param model."""
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.models.common import RenderResult
    from unboundednerfpytorch_tpu.optim.factory import lr_decay_scale
    from unboundednerfpytorch_tpu.train.step import (
        create_train_state,
        make_train_step,
    )
    from unboundednerfpytorch_tpu.models import dvgo
    from unboundednerfpytorch_tpu.fields.grids import DenseGrid

    cfg = dvgo.DVGOConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
        num_voxels=8**3, num_voxels_base=8**3, rgbnet_dim=0,
    )
    tc = TrainStageConfig(N_rand=8, lrate_decay=2, pg_scale=(),
                          weight_entropy_last=0.0, weight_rgbper=0.0,
                          weight_tv_density=0.0, weight_tv_k0=0.0,
                          pervoxel_lr=False)

    def fwd(p, ro, rd, vd, key, img_index=None):
        return dvgo.forward(p, cfg, ro, rd, vd, near=0.2, stepsize=0.5, bg=1.0)

    params = dvgo.create(cfg, jax.random.PRNGKey(0))
    n = 8
    batch = {
        "rgb": jnp.ones((n, 3)) * 0.3,
        "rays_o": jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, -1.5]),
        "rays_d": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1)),
        "viewdirs": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1)),
    }
    key = jax.random.PRNGKey(1)

    def delta_at(start_step, anchor):
        step = jax.jit(make_train_step(fwd, tc, lr_anchor=anchor))
        st = create_train_state(params, tc, start_step=start_step)
        new_state, _ = step(st, batch, key)
        return float(jnp.abs(
            new_state.params.density.grid - params.density.grid
        ).max())

    # training step 5 with anchor=5 == training step 1 with anchor=1
    d_fresh = delta_at(0, 1)
    d_anchored = delta_at(4, 5)
    assert np.isclose(d_fresh, d_anchored, rtol=1e-6), (d_fresh, d_anchored)
    # while an un-anchored step 5 is smaller by the decay factor
    d_decayed = delta_at(4, 1)
    assert np.isclose(
        d_decayed / d_fresh, float(lr_decay_scale(4, tc.lrate_decay)),
        rtol=1e-5,
    ), (d_decayed, d_fresh)


@pytest.mark.parametrize("family", ["dcvgo", "dmpigo"])
def test_rand_bkgd_reaches_dcvgo_dmpigo_forward(monkeypatch, family):
    """make_forward must thread rand_bkgd to the dcvgo/dmpigo training
    forwards (lf/llff_lg/custom configs set rand_bkgd=True)."""
    import importlib

    mod = importlib.import_module(f"unboundednerfpytorch_tpu.models.{family}")
    seen = {}
    real = mod.forward

    def spy(*args, **kwargs):
        seen["rand_bkgd_key"] = kwargs.get("rand_bkgd_key")
        return real(*args, **kwargs)

    monkeypatch.setattr(mod, "forward", spy)

    if family == "dcvgo":
        cfg = mod.config_from(
            ModelRenderConfig(num_voxels_rgb=8**3, num_voxels_density=8**3,
                              num_voxels_base_rgb=8**3,
                              num_voxels_base_density=8**3, rgbnet_dim=0,
                              bg_len=0.2),
            (-1, -1, -1), (1, 1, 1), 8**3,
        )
    else:
        cfg = mod.config_from(
            ModelRenderConfig(num_voxels_rgb=8**3, num_voxels_density=8**3,
                              num_voxels_base_rgb=8**3,
                              num_voxels_base_density=8**3, rgbnet_dim=0,
                              mpi_depth=16),
            (-1, -1, 1), (1, 1, 8), 8**3,
        )
    params = mod.create(cfg, jax.random.PRNGKey(0))

    import jax.numpy as jnp

    n = 4
    ro = jnp.zeros((n, 3))
    rd = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    for rand_bkgd, expect in ((True, True), (False, False)):
        fwd = loop.make_forward(
            family, cfg,
            {"near": 0.2, "far": 4.0, "bg": 1.0, "stepsize": 0.5,
             "rand_bkgd": rand_bkgd},
        )
        fwd(params, ro, rd, rd, jax.random.PRNGKey(2))
        assert (seen["rand_bkgd_key"] is not None) == expect, (family, rand_bkgd)


@pytest.mark.slow
def test_resume_across_pg_boundary_exact(tmp_path):
    """Kill-and-resume where the interruption lands AFTER a pg boundary must
    reproduce the uninterrupted trajectory (opt state + lr anchor + RNG)."""
    data = synthetic.make_data_dict(n_views=2, H=12, W=12)

    dir_a = str(tmp_path / "a")
    _, _, params_a, _ = loop.run_train(
        _tiny_cfg(8, pg_scale=(4,)), data, exp_dir=dir_a, log_fn=lambda s: None
    )

    dir_b = str(tmp_path / "b")
    loop.run_train(_tiny_cfg(6, pg_scale=(4,)), data, exp_dir=dir_b,
                   log_fn=lambda s: None)
    _, _, params_b, _ = loop.run_train(
        _tiny_cfg(8, pg_scale=(4,)), data, exp_dir=dir_b, log_fn=lambda s: None
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
