"""Remaining dataset loaders: Free-trajectory (F2-NeRF style cams_meta.npy),
nerfstudio, and CO3D.

Behavioral parity with ``load_free.py`` / ``load_co3d.py`` / the nerfstudio
branch of ``load_common_data.py`` in
``/root/reference/FourierGrid/common_data_loaders/``.
"""

from __future__ import annotations

import glob
import gzip
import json
import os

import numpy as np

from unboundednerfpytorch_tpu.data.llff import (
    _imread,
    normalize,
    poses_avg,
    viewmatrix,
)


# ---------------------------------------------------------------------------
# Free-trajectory scenes (cams_meta.npy: [N, 27] = 12 pose + 9 K + 4 dist + 2 bounds)
# ---------------------------------------------------------------------------

def _inter_poses(key_poses: np.ndarray, n_out: int) -> np.ndarray:
    """Smooth interpolation through key poses (slerp rotations + lerp
    positions) for the fly-through path."""
    from scipy.spatial.transform import Rotation, Slerp

    n_key = len(key_poses)
    times = np.linspace(0, n_key - 1, n_out)
    rots = Rotation.from_matrix(key_poses[:, :3, :3])
    slerp = Slerp(np.arange(n_key), rots)
    out = np.zeros((n_out, 3, 4), np.float32)
    out[:, :3, :3] = slerp(times).as_matrix()
    lo = np.clip(times.astype(int), 0, n_key - 2)
    frac = (times - lo)[:, None]
    out[:, :3, 3] = (
        key_poses[lo, :3, 3] * (1 - frac) + key_poses[lo + 1, :3, 3] * frac
    )
    return out


def _recenter_with_render(poses, render_poses):
    """Recenter both pose sets by the average pose (load_free.py:182-203)."""
    bottom = np.array([[0, 0, 0, 1.0]])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], 0)
    inv = np.linalg.inv(c2w)

    def apply(ps):
        hom = np.concatenate(
            [ps[:, :3, :4], np.tile(bottom[None], (len(ps), 1, 1))], 1
        )
        out = inv @ hom
        res = ps.copy()
        res[:, :3, :4] = out[:, :3, :4]
        return res

    return apply(poses), apply(render_poses)


def load_free_data(
    basedir: str,
    factor: int = 8,
    llffhold: int = 8,
    training_ids=None,
    n_out_poses: int = 200,
    sc: float = 1.0,
):
    """F2-NeRF 'free' scenes (load_free.py:272-344)."""
    cam_data = np.load(os.path.join(basedir, "cams_meta.npy")).reshape(-1, 27)
    n_images = cam_data.shape[0]
    poses = cam_data[:, 0:12].reshape(-1, 3, 4).astype(np.float32)
    intri = cam_data[:, 12:21].reshape(-1, 3, 3).astype(np.float32)
    bounds = cam_data[:, 25:27].reshape(-1, 2)

    imgdir = os.path.join(basedir, "images")
    imgfiles = sorted(
        f for f in glob.glob(os.path.join(imgdir, "*"))
        if f.lower().endswith(("jpg", "jpeg", "png"))
    )
    import cv2

    imgs = []
    for f in imgfiles[:n_images]:
        im = _imread(f)[..., :3]
        if factor > 1:
            im = cv2.resize(
                im, (im.shape[1] // factor, im.shape[0] // factor),
                interpolation=cv2.INTER_AREA,
            )
        imgs.append((im / 255.0).astype(np.float32))
    imgs = np.stack(imgs)
    intri[..., :2, :3] /= factor

    if training_ids is not None:
        ids = list(training_ids)
        poses, intri, imgs = poses[ids], intri[ids], imgs[ids]
        bounds = bounds[ids]

    key_poses = poses[np.arange(0, poses.shape[0], 5)]
    render_poses = _inter_poses(key_poses, n_out_poses)

    bounds = np.clip(bounds, 1e-2, 1e9)
    poses = poses.copy()
    poses[:, :3, 3] *= sc
    render_poses[:, :3, 3] *= sc

    hwf = np.array([imgs.shape[1], imgs.shape[2], intri[0, 0, 0]], np.float32)
    poses5 = np.concatenate(
        [poses, np.tile(hwf.reshape(1, 3, 1), (len(poses), 1, 1))], 2
    )
    render5 = np.concatenate(
        [render_poses, np.tile(hwf.reshape(1, 3, 1), (len(render_poses), 1, 1))], 2
    )
    poses5, render5 = _recenter_with_render(poses5, render5)

    i_test = (
        np.arange(imgs.shape[0])[::llffhold] if llffhold > 0 else [0, 1, 2]
    )
    return imgs, None, intri, poses5, bounds, render5, i_test


# ---------------------------------------------------------------------------
# nerfstudio (transforms.json with per-frame file_path + transform_matrix)
# ---------------------------------------------------------------------------

def load_nerfstudio_data(basedir: str, factor: int = 1, dvgohold: int = 8):
    """nerfstudio transforms.json → LLFF-style arrays."""
    with open(os.path.join(basedir, "transforms.json")) as f:
        meta = json.load(f)
    import cv2

    imgs, poses = [], []
    for frame in meta["frames"]:
        p = os.path.join(basedir, frame["file_path"])
        im = _imread(p)[..., :3]
        if factor > 1:
            im = cv2.resize(
                im, (im.shape[1] // factor, im.shape[0] // factor),
                interpolation=cv2.INTER_AREA,
            )
        imgs.append((im / 255.0).astype(np.float32))
        poses.append(np.asarray(frame["transform_matrix"], np.float32))
    imgs = np.stack(imgs)
    poses = np.stack(poses)
    H, W = imgs.shape[1:3]
    fl_x = meta.get("fl_x", meta.get("fl", W)) / factor
    hwf = np.array([H, W, fl_x], np.float32)
    poses5 = np.concatenate(
        [poses[:, :3, :4], np.tile(hwf.reshape(1, 3, 1), (len(poses), 1, 1))], 2
    )
    i_test = np.arange(len(imgs))[::dvgohold] if dvgohold > 0 else [0]
    bds = np.array([[0.1, 10.0]] * len(imgs))
    render_poses = poses5[list(i_test)]
    return imgs, None, poses5, bds, render_poses, list(i_test)


# ---------------------------------------------------------------------------
# CO3D (gzipped per-category annotation + set_lists split)
# ---------------------------------------------------------------------------

def load_co3d_data(datadir: str, annot_path: str, split_path: str,
                   sequence_name: str):
    """CO3D loader (load_co3d.py:12-85): per-frame masks, NDC-style intrinsics
    converted to pixels, empty-mask frames dropped."""
    with gzip.open(annot_path, "rt", encoding="utf8") as zf:
        annot = [v for v in json.load(zf) if v["sequence_name"] == sequence_name]
    with open(split_path) as f:
        split = json.load(f)
    train_im, test_im = set(), set()
    for k, lst in split.items():
        for v in lst:
            if v[0] == sequence_name:
                (train_im if "known" in k else test_im).add(v[-1])

    imgs, masks, poses, Ks = [], [], [], []
    i_split = [[], []]
    dropped = [0, 0]
    for meta in annot:
        fname = meta["image"]["path"]
        sid = 0 if fname in train_im else 1
        if meta["mask"]["mass"] == 0:
            dropped[sid] += 1
            continue
        mask = _imread(os.path.join(datadir, meta["mask"]["path"])) / 255.0
        if mask.max() < 0.5:
            dropped[sid] += 1
            continue
        Rt = np.concatenate(
            [meta["viewpoint"]["R"], np.array(meta["viewpoint"]["T"])[:, None]], 1
        )
        pose = np.linalg.inv(np.concatenate([Rt, [[0, 0, 0, 1]]]))
        imgs.append(_imread(os.path.join(datadir, fname)) / 255.0)
        masks.append(mask)
        poses.append(pose)
        half_wh = np.float32(meta["image"]["size"][::-1]) * 0.5
        pp = np.float32(meta["viewpoint"]["principal_point"])
        fl = np.float32(meta["viewpoint"]["focal_length"])
        pp_px = -1.0 * (pp - 1.0) * half_wh
        fl_px = fl * half_wh
        Ks.append(np.array([[fl_px[0], 0, pp_px[0]], [0, fl_px[1], pp_px[1]], [0, 0, 1]]))
        i_split[sid].append(len(imgs) - 1)

    imgs_arr = np.array(imgs, dtype=object) if len({im.shape for im in imgs}) > 1 else np.stack(imgs)
    masks_arr = np.array(masks, dtype=object) if len({m.shape for m in masks}) > 1 else np.stack(masks)
    poses = np.stack(poses)
    Ks = np.stack(Ks)
    render_poses = poses[i_split[-1]]
    i_split.append(i_split[-1])
    H, W = np.array([im.shape[:2] for im in imgs]).mean(0).astype(int)
    focal = Ks[:, [0, 1], [0, 1]].mean()
    return imgs_arr, masks_arr, poses, render_poses, [H, W, focal], Ks, i_split
