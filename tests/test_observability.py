"""Training observability (VERDICT r4 #8): scalar series completeness and
periodic held-out eval panels, the reference TensorBoardLogger equivalents
(train_block_nerf.py:111-113, block_nerf_lightning.py:128-137)."""

import dataclasses
import json
import os

import numpy as np

from unboundednerfpytorch_tpu.configs.schema import (
    DataConfig,
    ExpConfig,
    ModelRenderConfig,
    TrainStageConfig,
)
from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.train import loop
from unboundednerfpytorch_tpu.utils import observability


def test_panel_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    gt = rng.uniform(size=(12, 16, 3)).astype(np.float32)
    pred = np.clip(gt + 0.05, 0, 1)
    depth = rng.uniform(1.0, 5.0, size=(12, 16)).astype(np.float32)
    psnr = observability.record_panel(str(tmp_path), "fine", 100, gt, pred, depth)
    assert psnr > 20
    import imageio.v2 as imageio

    panel = imageio.imread(tmp_path / "panels" / "fine_000100.png")
    assert panel.shape == (12, 4 * 16, 3)  # [GT | pred | err | depth]
    rec = json.loads(
        (tmp_path / "panels" / "panels.jsonl").read_text().splitlines()[0]
    )
    assert rec["step"] == 100 and abs(rec["psnr"] - psnr) < 1e-3


def test_loop_emits_scalars_and_panels(tmp_path):
    data = synthetic.make_data_dict(n_views=6, H=24, W=24)
    cfg = ExpConfig(
        data=DataConfig(white_bkgd=True),
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=40, N_rand=256, pervoxel_lr=False, pg_scale=(),
            weight_entropy_last=1e-3, weight_rgbper=1e-2,
            weight_distortion=1e-3,
            skip_zero_grad_fields=("density", "k0"), i_panel=20,
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=16**3, num_voxels_density=16**3,
            num_voxels_base_rgb=16**3, num_voxels_base_density=16**3,
            rgbnet_dim=6, alpha_init=1e-2, fast_color_thres=1e-4,
            maskout_near_cam_vox=False,
        ),
    )
    exp_dir = str(tmp_path / "exp")
    loop.run_train(
        cfg, data, seed=0, log_fn=lambda *_: None, exp_dir=exp_dir,
        use_mesh=False,
    )
    # scalar series: every enabled loss component + lr_scale in each record
    recs = [
        json.loads(line)
        for line in open(os.path.join(exp_dir, "fine_metrics.jsonl"))
    ]
    assert recs, "no scalar records written"
    for k in ("loss", "mse", "psnr", "lr_scale", "loss_entropy",
              "loss_rgbper", "loss_distortion"):
        assert k in recs[-1], (k, sorted(recs[-1]))
    # panels at steps 20 and 40 + the psnr series
    pdir = os.path.join(exp_dir, "panels")
    assert sorted(os.listdir(pdir)) == [
        "fine_000020.png", "fine_000040.png", "panels.jsonl"
    ]
    panel_recs = [
        json.loads(line) for line in open(os.path.join(pdir, "panels.jsonl"))
    ]
    assert [r["step"] for r in panel_recs] == [20, 40]
