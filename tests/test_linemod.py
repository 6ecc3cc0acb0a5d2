"""LINEMOD family end-to-end: synthetic on-disk sequence -> loader ->
data hub -> CLI linemod_eval program (the wiring the reference leaves
unreleased — configs/linemod/* + pose_utils/linemod_evaluator.py)."""

import json
import os

import numpy as np
import pytest

from unboundednerfpytorch_tpu.utils import pose_eval


def _make_sequence(root, seq="ape", n=12):
    import imageio.v2 as imageio
    from scipy.spatial.transform import Rotation as R

    seq_dir = os.path.join(root, seq)
    os.makedirs(os.path.join(seq_dir, "JPEGImages"))
    os.makedirs(os.path.join(seq_dir, "pose"))
    os.makedirs(os.path.join(seq_dir, "mask"))
    rng = np.random.default_rng(0)
    for i in range(n):
        rot = R.from_euler("zyx", [i * 30.0, 10.0, 5.0], degrees=True).as_matrix()
        t = np.array([0.01 * i, 0.0, 0.6])
        rt = np.concatenate([rot, t[:, None]], axis=1).astype(np.float64)
        np.save(os.path.join(seq_dir, "pose", f"pose{i}.npy"), rt)
        img = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(seq_dir, "JPEGImages", f"{i:06d}.jpg"), img)
        mask = np.zeros((480, 640), np.uint8)
        mask[200:280, 280:360] = 255
        imageio.imwrite(os.path.join(seq_dir, "mask", f"{i:06d}.png"), mask)
    # object model: a small point cloud around the origin
    pts = rng.uniform(-0.05, 0.05, size=(64, 3))
    np.save(os.path.join(seq_dir, "model_points.npy"), pts)
    return seq_dir


def test_linemod_loader(tmp_path):
    from unboundednerfpytorch_tpu.data import linemod as lm

    _make_sequence(str(tmp_path))
    images, poses, Ks, obj_poses, i_train, i_test = lm.load_linemod_data(
        str(tmp_path), "ape", width_max=90, height_max=90
    )
    assert images.shape[1:] == (90, 90, 3)
    assert poses.shape[1:] == (4, 4)
    assert obj_poses.shape[1:] == (3, 4)
    assert len(i_train) + len(i_test) == len(images)
    # c2w is the inverse of the object pose
    rt = np.eye(4)
    rt[:3] = obj_poses[0]
    np.testing.assert_allclose(poses[0] @ rt, np.eye(4), atol=1e-5)
    # cropped intrinsics keep the projected object center in frame
    c = Ks[0] @ obj_poses[0][:, 3]
    cx, cy = c[:2] / c[2]
    assert 0 <= cx <= 90 and 0 <= cy <= 90


def test_linemod_data_hub(tmp_path):
    from unboundednerfpytorch_tpu.configs.schema import DataConfig
    from unboundednerfpytorch_tpu.data import common

    _make_sequence(str(tmp_path))
    dd = common.load_common_data(DataConfig(
        datadir=str(tmp_path), dataset_type="linemod", seq_name="ape",
        width_max=90, height_max=90, white_bkgd=True,
    ))
    assert dd["near"] < dd["far"]
    assert dd["images"].shape[1:] == (90, 90, 3)
    assert "object_poses" in dd


def test_linemod_eval_cli(tmp_path):
    from unboundednerfpytorch_tpu.cli import main as cli_main

    _make_sequence(str(tmp_path))
    cfg_path = tmp_path / "ape_cfg.py"
    cfg_path.write_text(
        "expname='ape_test'\n"
        f"basedir='{tmp_path}/logs'\n"
        "data=dict(dataset_type='linemod', "
        f"datadir='{tmp_path}', seq_name='ape', "
        "width_max=90, height_max=90, white_bkgd=True)\n"
    )
    rc = cli_main.main([
        "--config", str(cfg_path), "--program", "linemod_eval",
    ])
    assert rc == 0
    out = json.loads(
        (tmp_path / "logs" / "ape_test" / "linemod_metrics.json").read_text()
    )
    # GT-vs-GT sanity mode: every metric must be perfect
    assert out["proj2d"] == 1.0
    assert out["add"] == 1.0
    assert out["cmd5"] == 1.0


def test_evaluator_detects_bad_poses():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.05, 0.05, size=(32, 3))
    gt = np.concatenate([np.eye(3), np.array([[0.0], [0.0], [0.6]])], axis=1)
    bad = gt.copy()
    bad[:, 3] += 0.2  # 20 cm off: fails ADD-0.1d and 5cm5deg
    summary = pose_eval.evaluate_linemod_sequence(
        "ape", pts, np.stack([bad]), np.stack([gt])
    )
    assert summary["add"] == 0.0
    assert summary["cmd5"] == 0.0


def test_ply_reader(tmp_path):
    ply = tmp_path / "model.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 0 0\n1 2 3\n-1 -2 -3\n"
    )
    pts = pose_eval._read_ply_points(str(ply))
    np.testing.assert_allclose(pts, [[0, 0, 0], [1, 2, 3], [-1, -2, -3]])
