"""Loader tests against synthetic on-disk fixtures (no dataset downloads):
waymo metadata.json, blender transforms, block-nerf ray store, resume path."""

import dataclasses
import json
import os

import numpy as np
import pytest


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr)


def _make_waymo_fixture(root, n_train=4, n_val=2, H=8, W=10):
    os.makedirs(os.path.join(root, "images_train"), exist_ok=True)
    os.makedirs(os.path.join(root, "images_val"), exist_ok=True)
    rng = np.random.RandomState(0)
    meta = {}
    for split, n in (("train", n_train), ("val", n_val)):
        m = {k: [] for k in ("file_path", "cam2world", "K", "width", "height",
                             "position", "cam_idx", "equivalent_exposure")}
        for i in range(n):
            name = f"images_{split}/{split}{i:03d}.png"
            _write_png(os.path.join(root, name),
                       (rng.rand(H, W, 3) * 255).astype(np.uint8))
            c2w = np.eye(4)
            c2w[:3, 3] = [i * 0.1, i * 0.05, 0.0]
            m["file_path"].append(name)
            m["cam2world"].append(c2w.tolist())
            m["K"].append([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
            m["width"].append(W)
            m["height"].append(H)
            m["position"].append(c2w[:3, 3].tolist())
            m["cam_idx"].append(0)
            m["equivalent_exposure"].append(1.0)
        meta[split] = m
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(meta, f)


def test_waymo_loader(tmp_path):
    from unboundednerfpytorch_tpu.data import waymo

    _make_waymo_fixture(str(tmp_path))
    d = waymo.load_waymo_data(str(tmp_path))
    assert len(d["i_train"]) == 4 and len(d["i_val"]) == 2
    assert len(d["i_test"]) == 200  # generated rotational trajectory
    assert d["images"].shape[0] == 6
    assert d["poses"].shape[0] == 6 + 200
    assert d["near_clip"] > 0 and d["far"] > 0


def test_blender_loader(tmp_path):
    from unboundednerfpytorch_tpu.data import loaders

    rng = np.random.RandomState(1)
    for split, n in (("train", 3), ("val", 1), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"r_{i}"
            _write_png(os.path.join(tmp_path, name + ".png"),
                       (rng.rand(12, 12, 4) * 255).astype(np.uint8))
            frames.append({
                "file_path": name,
                "transform_matrix": np.eye(4).tolist(),
            })
        with open(os.path.join(tmp_path, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    imgs, poses, render_poses, hwf, i_split = loaders.load_blender_data(str(tmp_path))
    assert imgs.shape == (6, 12, 12, 4)
    assert len(i_split[0]) == 3 and len(i_split[2]) == 2
    assert render_poses.shape[0] == 160


def test_block_nerf_ray_store(tmp_path):
    from unboundednerfpytorch_tpu.models.block_nerf import dataset

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "train", "rgbs"), exist_ok=True)
    rng = np.random.RandomState(2)
    meta, elements = {}, []
    for i in range(3):
        name = f"img{i}"
        _write_png(os.path.join(root, "train", "rgbs", name + ".png"),
                   (rng.rand(16, 20, 3) * 255).astype(np.uint8))
        meta[name] = {
            "image_name": name, "W": 20, "H": 16,
            "intrinsics": [40.0, 40.0],
            "c2w": np.eye(4)[:3].tolist() if False else np.eye(4).tolist(),
            "equivalent_exposure": 0.5,
        }
        elements.append([name, i])
    with open(os.path.join(root, "train", "train_all_meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "train", "split_block_train.json"), "w") as f:
        json.dump({"block_0": {"centroid": [0, 0, 0], "elements": elements}}, f)

    store, n_img = dataset.load_block_ray_store(root, img_downscale=2)
    assert n_img == 3
    hw = (16 // 2) * (20 // 2)
    assert store["rays"].shape == (3 * hw, 10)
    assert store["rgbs"].shape == (3 * hw, 3)
    assert store["ts"].max() == 2
    # unit directions + positive radii
    d = store["rays"][:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (store["rays"][:, 6] > 0).all()


@pytest.mark.slow
def test_train_resume_from_checkpoint(tmp_path):
    from unboundednerfpytorch_tpu.configs.schema import (
        ExpConfig, ModelRenderConfig, TrainStageConfig, DataConfig,
    )
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.train import loop

    data = synthetic.make_data_dict(n_views=4, H=16, W=16)
    cfg = ExpConfig(
        data=DataConfig(white_bkgd=True),
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=20, N_rand=128, pervoxel_lr=False, pg_scale=(),
            skip_zero_grad_fields=("density", "k0"),
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=16**3, num_voxels_density=16**3,
            num_voxels_base_rgb=16**3, num_voxels_base_density=16**3,
            rgbnet_dim=4, alpha_init=1e-2, maskout_near_cam_vox=False,
        ),
    )
    exp = str(tmp_path)
    loop.run_train(cfg, data, log_fn=lambda s: None, exp_dir=exp)
    assert os.path.exists(os.path.join(exp, "fine_last", "meta.json"))
    # second run resumes at the final step -> zero additional iterations
    msgs = []
    loop.run_train(cfg, data, log_fn=msgs.append, exp_dir=exp)
    assert any("resumed" in m for m in msgs)


def test_waymo_overrides_and_diffuse(tmp_path):
    """DataConfig near/far/near_clip overrides thread through load_everything
    (waymo_no_block.py:12-14), and --diffuse swaps training images for the
    config's diffusion replacements (load_waymo.py:287-293)."""
    from unboundednerfpytorch_tpu.configs.schema import DataConfig, ExpConfig
    from unboundednerfpytorch_tpu.data.common import load_everything

    root = str(tmp_path)
    _make_waymo_fixture(root)
    # a solid-color replacement image under diffusion/
    os.makedirs(os.path.join(root, "diffusion"))
    _write_png(os.path.join(root, "diffusion", "airplane.png"),
               np.full((8, 10, 3), 200, np.uint8))

    cfg = ExpConfig(
        data=DataConfig(dataset_type="waymo", datadir=root,
                        near=0.5, far=2.0, near_clip=0.3),
        diffusion=(("diff_root", os.path.join(root, "diffusion")),
                   ("diff_replace", (("train000", "airplane"),))),
    )
    d = load_everything(cfg)
    assert d["near"] == 0.5 and d["far"] == 2.0 and d["near_clip"] == 0.3

    d2 = load_everything(cfg, diffuse=True)
    # train image 0 became the solid replacement; without diffuse it is noise
    img0 = np.asarray(d2["images"][d2["i_train"][0]])
    assert np.allclose(img0, 200 / 255.0, atol=1e-2)
    img0_plain = np.asarray(d["images"][d["i_train"][0]])
    assert not np.allclose(img0_plain, 200 / 255.0, atol=1e-2)
