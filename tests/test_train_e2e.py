"""End-to-end integration: train DVGO on a synthetic bounded scene (CPU) and
verify the reconstruction converges — the framework's equivalent of the
reference's tiny-lego sanity config (BASELINE.json configs[0])."""

import dataclasses

import pytest

from unboundednerfpytorch_tpu.configs.schema import (
    ExpConfig,
    ModelRenderConfig,
    TrainStageConfig,
)
from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.train import loop


@pytest.mark.slow
def test_dvgo_trains_on_synthetic_sphere():
    data = synthetic.make_data_dict(n_views=6, H=32, W=32)
    cfg = ExpConfig(
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=150,
            N_rand=512,
            pervoxel_lr=False,
            pg_scale=(),
            skip_zero_grad_fields=("density", "k0"),
            weight_entropy_last=0.001,
            weight_rgbper=0.01,
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=32**3,
            num_voxels_density=32**3,
            num_voxels_base_rgb=32**3,
            num_voxels_base_density=32**3,
            rgbnet_dim=9,
            alpha_init=1e-2,
            fast_color_thres=1e-4,
            maskout_near_cam_vox=False,
            world_bound_scale=1.05,
        ),
    )
    _, _, _, psnr = loop.run_train(cfg, data, log_fn=lambda s: None)
    assert psnr > 14.0, f"training did not converge: psnr={psnr}"


@pytest.mark.slow
def test_dvgo_pg_scale_boundary():
    """Progressive upsampling mid-training must not break the step."""
    data = synthetic.make_data_dict(n_views=4, H=24, W=24)
    cfg = ExpConfig(
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=60,
            N_rand=256,
            pervoxel_lr=False,
            pg_scale=(30,),
            skip_zero_grad_fields=("density", "k0"),
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=24**3,
            num_voxels_density=24**3,
            num_voxels_base_rgb=24**3,
            num_voxels_base_density=24**3,
            rgbnet_dim=6,
            alpha_init=1e-2,
            fast_color_thres=1e-4,
            maskout_near_cam_vox=False,
        ),
    )
    family, mcfg, params, _ = loop.run_train(cfg, data, log_fn=lambda s: None)
    # grid must have been upsampled back to the full resolution
    assert mcfg.world_size == (24, 24, 24) or max(mcfg.world_size) >= 23
