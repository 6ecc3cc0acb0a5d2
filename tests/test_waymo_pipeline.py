"""End-to-end Waymo ingestion chain, tensorflow-free: synthetic Block-NeRF
TFRecords -> decode (record framing + tf.Example parse + rotation recovery)
-> metadata.json -> block split -> load_everything -> a few FourierGrid
train steps. Glues together the stages the reference spreads across
data_preprocess/fetch_data_from_tf_record.py, split_block.py, and
load_waymo.py; each stage also has focused tests (test_tfrecord.py)."""

import io
import json
import os

import numpy as np
import pytest

from unboundednerfpytorch_tpu.data import preprocess, tfrecord as tfr


def _synth_frame(rng, h=10, w=12, cam_idx=0, origin=None):
    import imageio.v2 as iio
    from scipy.spatial.transform import Rotation

    fx = fy = 12.0
    R = Rotation.from_euler("zyx", rng.uniform(-0.3, 0.3, 3)).as_matrix()
    if origin is None:
        origin = rng.uniform(-1, 1, 3)
    j, i = np.mgrid[0:h, 0:w].astype(np.float32)
    cam_dirs = np.stack(
        [(i - w / 2 + 0.5) / fx, -(j - h / 2 + 0.5) / fy, -np.ones_like(i)],
        -1,
    )
    cam_dirs /= np.linalg.norm(cam_dirs, axis=-1, keepdims=True)
    world_dirs = cam_dirs @ R.T
    img = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    iio.imwrite(buf, img, format="png")
    return {
        "image_hash": [1],
        "cam_idx": [cam_idx],
        "equivalent_exposure": np.array([0.5], np.float32),
        "height": [h],
        "width": [w],
        "image": buf.getvalue(),
        "ray_origins": np.broadcast_to(
            np.asarray(origin, np.float32), (h, w, 3)
        ).reshape(-1),
        "ray_dirs": world_dirs.astype(np.float32).reshape(-1),
        "intrinsics": np.array([fx, fy], np.float32),
    }


@pytest.mark.slow
def test_tfrecord_to_training(tmp_path):
    rng = np.random.default_rng(0)

    # 1. synthetic TFRecords: 6 train frames along a line + 2 val frames
    train_payloads = [
        tfr.encode_example(
            _synth_frame(rng, origin=[0.6 * k, 0.0, 0.0], cam_idx=0)
        )
        for k in range(6)
    ]
    val_payloads = [
        tfr.encode_example(
            _synth_frame(rng, origin=[0.6 * k + 0.3, 0.1, 0.0], cam_idx=1)
        )
        for k in range(2)
    ]
    rec_tr = str(tmp_path / "waymo_train.tfrecord.gz")
    rec_va = str(tmp_path / "waymo_validation.tfrecord.gz")
    tfr.write_records(rec_tr, train_payloads, compress=True)
    tfr.write_records(rec_va, val_payloads, compress=True)

    # 2. decode to images + metadata.json (TF-free)
    out = str(tmp_path / "waymo_ordered_dataset")
    meta = preprocess.decode_waymo_tfrecords([rec_tr, rec_va], out)
    assert len(meta["train"]["file_path"]) == 6
    assert len(meta["val"]["file_path"]) == 2
    assert os.path.exists(os.path.join(out, "metadata.json"))

    # 3. block split over the camera origins (split_block.py semantics)
    origins = {
        name: pos for name, pos in zip(
            meta["train"]["file_path"], meta["train"]["position"]
        )
    }
    blocks = preprocess.split_blocks(origins, radius=1.0, overlap=0.5)
    assert len(blocks) >= 2  # the 3-unit trajectory splits
    all_elems = {e[0] for b in blocks.values() for e in b["elements"]}
    assert all_elems == set(origins)  # every image lands in some block
    preprocess.write_block_split(
        blocks, os.path.join(out, "split_block_train.json")
    )

    # 4. the standard waymo loader consumes the decoded dataset
    from unboundednerfpytorch_tpu.configs.schema import DataConfig, ExpConfig
    from unboundednerfpytorch_tpu.data.common import load_everything

    cfg_data = DataConfig(dataset_type="waymo", datadir=out,
                          near=0.1, far=6.0, near_clip=0.05)
    data_dict = load_everything(ExpConfig(data=cfg_data))
    assert len(data_dict["i_train"]) == 6
    assert len(data_dict["i_test"]) == 200  # generated rotational traj

    # 5. a few real FourierGrid train steps on the decoded scene
    import dataclasses

    from unboundednerfpytorch_tpu.configs.schema import (
        ModelRenderConfig, TrainStageConfig,
    )
    from unboundednerfpytorch_tpu.train import loop

    cfg = ExpConfig(
        model="FourierGrid",
        data=cfg_data,
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=3, N_rand=64, pervoxel_lr=False, pg_scale=(),
            skip_zero_grad_fields=("density", "k0"),
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_density=16**3, num_voxels_rgb=16**3,
            num_voxels_base_density=16**3, num_voxels_base_rgb=16**3,
            rgbnet_dim=4, rgbnet_width=16, rgbnet_depth=2,
            alpha_init=1e-2, fast_color_thres=1e-4, fourier_freq_num=1,
            maskout_near_cam_vox=False,
        ),
    )
    family, mcfg, params, psnr = loop.run_train(
        cfg, data_dict, log_fn=lambda *a: None
    )
    assert family == "FourierGrid" and np.isfinite(psnr)
