"""Kill-and-resume: an interrupted run restored from its checkpoint must
reproduce the uninterrupted trajectory exactly — params AND Adam moments
(reference saves/reloads optimizer_state_dict, run_train.py:313-331, with
``--no_reload_optimizer`` to opt out, run_FourierGrid.py:36-37)."""

import dataclasses

import numpy as np
import pytest

import jax

from unboundednerfpytorch_tpu.configs.schema import (
    ExpConfig,
    ModelRenderConfig,
    TrainStageConfig,
)
from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.train import loop


def _cfg(n_iters: int) -> ExpConfig:
    return ExpConfig(
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=n_iters,
            N_rand=128,
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
            maskout_near_cam_vox=False,
        ),
    )


def _leaves(tree):
    return [
        np.asarray(x, dtype=np.float64)
        for x in jax.tree.leaves(tree)
        if np.asarray(x).dtype != np.bool_
    ]


@pytest.mark.slow
def test_resume_restores_optimizer_trajectory(tmp_path):
    data = synthetic.make_data_dict(n_views=3, H=16, W=16)

    # uninterrupted 30-step run
    dir_a = str(tmp_path / "a")
    _, _, params_a, _ = loop.run_train(
        _cfg(30), data, exp_dir=dir_a, log_fn=lambda s: None
    )

    # interrupted: 15 steps (checkpoint incl. opt state at stage end), then
    # resume with the 30-step config from the same exp dir
    dir_b = str(tmp_path / "b")
    loop.run_train(_cfg(15), data, exp_dir=dir_b, log_fn=lambda s: None)
    _, _, params_b, _ = loop.run_train(
        _cfg(30), data, exp_dir=dir_b, log_fn=lambda s: None
    )

    for a, b in zip(_leaves(params_a), _leaves(params_b)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    # negative control: dropping the optimizer state must change the result
    dir_c = str(tmp_path / "c")
    loop.run_train(_cfg(15), data, exp_dir=dir_c, log_fn=lambda s: None)
    _, _, params_c, _ = loop.run_train(
        _cfg(30), data, exp_dir=dir_c, no_reload_optimizer=True,
        log_fn=lambda s: None,
    )
    diffs = [
        float(np.abs(a - c).max())
        for a, c in zip(_leaves(params_a), _leaves(params_c))
    ]
    assert max(diffs) > 1e-5, "no_reload_optimizer had no effect"


def test_checkpoint_contains_opt_state(tmp_path):
    import os

    data = synthetic.make_data_dict(n_views=3, H=16, W=16)
    dir_a = str(tmp_path / "a")
    loop.run_train(_cfg(5), data, exp_dir=dir_a, log_fn=lambda s: None)
    assert os.path.exists(os.path.join(dir_a, "fine_last", "opt_state.msgpack"))
