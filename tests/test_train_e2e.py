"""End-to-end integration: train DVGO on a synthetic bounded scene (CPU) and
verify the reconstruction converges — the framework's equivalent of the
reference's tiny-lego sanity config (BASELINE.json configs[0])."""

import dataclasses

import pytest

from unboundednerfpytorch_tpu.configs.schema import (
    DataConfig,
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


@pytest.mark.slow
def test_coarse_to_fine_mask_transfer():
    """Fine stage must inherit occupancy from the coarse solution (the
    reference's mask_cache_path reload): after a coarse stage the fine
    mask_cache should be substantially sparsified."""
    import numpy as np

    data = synthetic.make_data_dict(n_views=4, H=20, W=20)
    cfg = ExpConfig(
        data=dataclasses.replace(DataConfig(), white_bkgd=True),
        coarse_train=TrainStageConfig(N_iters=80, N_rand=256, pervoxel_lr=False),
        fine_train=TrainStageConfig(
            N_iters=40, N_rand=256, pervoxel_lr=False, pg_scale=(),
            skip_zero_grad_fields=("density", "k0"),
        ),
        coarse_model_and_render=ModelRenderConfig(
            num_voxels_rgb=16**3, num_voxels_density=16**3,
            num_voxels_base_rgb=16**3, num_voxels_base_density=16**3,
            alpha_init=1e-4, maskout_near_cam_vox=False,
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=24**3, num_voxels_density=24**3,
            num_voxels_base_rgb=24**3, num_voxels_base_density=24**3,
            rgbnet_dim=4, alpha_init=1e-2, maskout_near_cam_vox=False,
            mask_cache_thres=1e-3,
        ),
    )
    _, _, params, _ = loop.run_train(cfg, data, log_fn=lambda s: None)
    import numpy as np

    occ = float(np.asarray(params.mask_cache.mask).mean())
    assert occ < 0.9, f"fine occupancy not sparsified by coarse solution: {occ}"


@pytest.mark.slow
def test_deferred_sample_budget_activates_at_pg_scale():
    data = synthetic.make_data_dict(n_views=4, H=16, W=16)
    cfg = ExpConfig(
        model="FourierGrid",
        data=dataclasses.replace(DataConfig(), white_bkgd=True),
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=40, N_rand=128, pervoxel_lr=False, pg_scale=(20,),
            skip_zero_grad_fields=("density", "k0"),
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=20**3, num_voxels_density=20**3,
            num_voxels_base_rgb=20**3, num_voxels_base_density=20**3,
            rgbnet_dim=4, alpha_init=1e-2, fourier_freq_num=2,
            maskout_near_cam_vox=False, stepsize=1.0, sample_budget=16,
        ),
    )
    _, mcfg, _, psnr = loop.run_train(cfg, data, log_fn=lambda s: None)
    assert mcfg.sample_budget == 16  # re-enabled after the pg boundary
    import numpy as np

    assert np.isfinite(psnr)
