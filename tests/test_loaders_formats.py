"""Every remaining dataset format through ``load_everything`` against tiny
synthetic on-disk fixtures: tankstemple, nsvf, blendedmvs, deepvoxels,
nerfpp, llff, free (F2-NeRF), nerfstudio, co3d. (waymo/blender/mega/linemod
are covered in test_loaders_synthetic.py / their own suites.)

Asserts the data_dict contract of the reference's load_everything
(/root/reference/FourierGrid/load_everything.py:21-26): HW, Ks, near, far,
i_train/i_val/i_test, poses, render_poses, images.
"""

import gzip
import json
import os

import numpy as np
import pytest

from unboundednerfpytorch_tpu.configs.schema import DataConfig, ExpConfig
from unboundednerfpytorch_tpu.data.common import load_everything

H, W = 8, 10


def _png(path, rng, h=H, w=W):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, (rng.rand(h, w, 3) * 255).astype(np.uint8))


def _pose(i, r=4.0):
    th = 0.6 * i
    c2w = np.eye(4)
    c2w[:3, 3] = [r * np.cos(th), r * np.sin(th), 1.0]
    return c2w


def _check_contract(d, n_images=None):
    for k in ("HW", "Ks", "near", "far", "i_train", "i_val", "i_test",
              "poses", "render_poses", "images"):
        assert k in d, k
    assert float(d["far"]) > float(d["near"])
    assert len(d["i_train"]) > 0 and len(d["i_test"]) > 0
    poses = np.asarray(d["poses"])
    # some families keep 4x4 c2w (the ray generator slices [:3,:4])
    assert poses.shape[-1] == 4 and poses.shape[-2] in (3, 4)
    assert np.all(np.isfinite(poses))
    HW = np.asarray(d["HW"])
    Ks = np.asarray(d["Ks"])
    assert HW.shape[0] == Ks.shape[0]
    if n_images is not None:
        assert len(np.asarray(d["images"])) == n_images


def _cfg(**data_kwargs):
    return ExpConfig(data=DataConfig(**data_kwargs))


def _write_pose_rgb(root, n, split_of, pose44=True):
    """NSVF-style layout: pose/*.txt + rgb/*.png, split = filename prefix."""
    rng = np.random.RandomState(0)
    for i in range(n):
        s = split_of(i)
        np.savetxt(os.path.join(root, "pose", f"{s}_{i:03d}.txt"),
                   _pose(i) if pose44 else _pose(i)[:3])
        os.makedirs(os.path.join(root, "pose"), exist_ok=True)
        _png(os.path.join(root, "rgb", f"{s}_{i:03d}.png"), rng)


def test_tankstemple(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "pose"))
    _write_pose_rgb(root, 6, lambda i: 0 if i < 4 else 1)
    np.savetxt(os.path.join(root, "intrinsics.txt"),
               np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]]))
    d = load_everything(_cfg(datadir=root, dataset_type="tankstemple",
                             white_bkgd=True))
    _check_contract(d, 6)
    assert len(d["i_train"]) == 4 and len(d["i_test"]) == 2
    assert np.asarray(d["render_poses"]).shape[0] == 200  # fly-through


def test_nsvf(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "pose"))
    _write_pose_rgb(root, 7, lambda i: min(i // 3, 2))
    with open(os.path.join(root, "intrinsics.txt"), "w") as f:
        f.write("50.0 5.0 4.0 0.\n")
    d = load_everything(_cfg(datadir=root, dataset_type="nsvf",
                             white_bkgd=True))
    _check_contract(d, 7)
    assert np.asarray(d["render_poses"]).shape[0] == 200


def test_blendedmvs(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "pose"))
    _write_pose_rgb(root, 5, lambda i: 0 if i < 4 else 1)
    np.savetxt(os.path.join(root, "intrinsics.txt"),
               np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]]))
    traj = np.stack([_pose(i) for i in range(4)])
    np.savetxt(os.path.join(root, "test_traj.txt"), traj.reshape(-1, 4))
    d = load_everything(_cfg(datadir=root, dataset_type="blendedmvs",
                             inverse_y=True))
    _check_contract(d, 5)
    assert np.asarray(d["render_poses"]).shape[0] == 4


def test_deepvoxels(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(2)
    for split, n in (("train", 4), ("validation", 2), ("test", 2)):
        base = os.path.join(root, split, "greek")
        os.makedirs(os.path.join(base, "pose"))
        for i in range(n):
            np.savetxt(os.path.join(base, "pose", f"{i:03d}.txt"),
                       _pose(i).reshape(-1))
            _png(os.path.join(base, "rgb", f"{i:03d}.png"), rng, H, H)
        if split == "train":
            with open(os.path.join(base, "intrinsics.txt"), "w") as f:
                f.write(f"50.0 {H/2} {H/2} 0.\n0. 0. 0.\n1.\n{H} {H}\n")
    d = load_everything(_cfg(datadir=root, dataset_type="deepvoxels",
                             sequence_name="greek", white_bkgd=True,
                             testskip=1))
    _check_contract(d, 8)
    assert len(d["i_train"]) == 4


def test_nerfpp(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(3)
    for split, n in (("train", 4), ("test", 2)):
        base = os.path.join(root, split)
        for sub in ("intrinsics", "pose", "rgb"):
            os.makedirs(os.path.join(base, sub))
        for i in range(n):
            K = np.eye(4)
            K[0, 0] = K[1, 1] = 50.0
            K[0, 2], K[1, 2] = W / 2, H / 2
            np.savetxt(os.path.join(base, "intrinsics", f"{i:05d}.txt"),
                       K.reshape(-1))
            np.savetxt(os.path.join(base, "pose", f"{i:05d}.txt"),
                       _pose(i if split == "train" else i + 4).reshape(-1))
            _png(os.path.join(base, "rgb", f"{i:05d}.png"), rng)
    d = load_everything(_cfg(datadir=root, dataset_type="nerfpp",
                             unbounded_inward=True))
    _check_contract(d, 6)
    assert len(d["i_train"]) == 4 and len(d["i_test"]) == 2


def test_llff(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(4)
    n = 6
    for i in range(n):
        _png(os.path.join(root, "images", f"img{i:03d}.png"), rng)
    poses_bounds = np.zeros((n, 17), np.float64)
    for i in range(n):
        p = _pose(i)[:3, :4]
        hwf = np.array([H, W, 50.0]).reshape(3, 1)
        poses_bounds[i, :15] = np.concatenate([p, hwf], 1).reshape(-1)
        poses_bounds[i, 15:] = [1.0, 12.0]
    np.save(os.path.join(root, "poses_bounds.npy"), poses_bounds)
    d = load_everything(_cfg(datadir=root, dataset_type="llff", factor=1,
                             llffhold=3))
    _check_contract(d, n)
    assert len(d["i_test"]) == 2  # every 3rd


def test_free(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(5)
    n = 6
    cams = np.zeros((n, 27), np.float64)
    for i in range(n):
        cams[i, :12] = _pose(i)[:3, :4].reshape(-1)
        K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
        cams[i, 12:21] = K.reshape(-1)
        cams[i, 25:27] = [1.0, 20.0]
        _png(os.path.join(root, "images", f"{i:03d}.png"), rng)
    np.save(os.path.join(root, "cams_meta.npy"), cams)
    d = load_everything(_cfg(datadir=root, dataset_type="free", factor=1,
                             llffhold=3))
    _check_contract(d, n)


def test_nerfstudio(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(6)
    frames = []
    for i in range(6):
        name = f"images/frame_{i:04d}.png"
        _png(os.path.join(root, name), rng)
        frames.append({"file_path": name,
                       "transform_matrix": _pose(i).tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"fl_x": 50.0, "frames": frames}, f)
    d = load_everything(_cfg(datadir=root, dataset_type="nerfstudio",
                             factor=1, llffhold=3))
    _check_contract(d, 6)


def test_co3d(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(7)
    seq = "seq1"
    annot = []
    split = {"train_known": [], "test_unseen": []}
    for i in range(5):
        img_p = f"images/frame{i:03d}.png"
        mask_p = f"masks/frame{i:03d}.png"
        _png(os.path.join(root, img_p), rng)
        import imageio.v2 as imageio

        os.makedirs(os.path.join(root, "masks"), exist_ok=True)
        imageio.imwrite(os.path.join(root, mask_p),
                        np.full((H, W), 255, np.uint8))
        c2w = _pose(i)
        w2c = np.linalg.inv(c2w)
        annot.append({
            "sequence_name": seq,
            "image": {"path": img_p, "size": [H, W]},
            "mask": {"path": mask_p, "mass": H * W},
            "viewpoint": {
                "R": w2c[:3, :3].tolist(),
                "T": w2c[:3, 3].tolist(),
                "principal_point": [0.0, 0.0],
                "focal_length": [5.0, 5.0],
            },
        })
        key = "train_known" if i < 4 else "test_unseen"
        split[key].append([seq, i, img_p])
    annot_path = os.path.join(root, "annot.json.gz")
    with gzip.open(annot_path, "wt", encoding="utf8") as zf:
        json.dump(annot, zf)
    split_path = os.path.join(root, "split.json")
    with open(split_path, "w") as f:
        json.dump(split, f)
    d = load_everything(_cfg(datadir=root, dataset_type="co3d",
                             annot_path=annot_path, split_path=split_path,
                             sequence_name=seq, white_bkgd=True))
    _check_contract(d, 5)
    assert len(d["i_train"]) == 4 and len(d["i_test"]) == 1
