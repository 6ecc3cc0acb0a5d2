"""Waymo Block-NeRF metadata loader + synthetic test trajectories.

Behavioral parity with ``/root/reference/FourierGrid/load_waymo.py`` and
``trajectory_generators/waymo_traj.py``: metadata.json → poses/Ks/images,
position sorting, camera/idx/training-id subsetting, image resizing, the
rotational test trajectory, and the near/far heuristic.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _imread(path):
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def _sample_list(lst, idxs):
    return [lst[i] for i in idxs if i < len(lst)]


def sort_metadata_by_pos(metadata: dict) -> dict:
    """Sort each split by camera position (y then x) — load_waymo.py:142-150."""
    for split in metadata:
        idxs = list(range(len(metadata[split]["position"])))
        order = [
            i
            for i, _ in sorted(
                zip(idxs, metadata[split]["position"]),
                key=lambda row: (row[1][1], row[1][0]),
            )
        ]
        for k in metadata[split]:
            metadata[split][k] = _sample_list(metadata[split][k], order)
    return metadata


def sample_metadata_by_cam(metadata: dict, cam_idx: int) -> dict:
    for split in metadata:
        keep = [
            i for i, c in enumerate(metadata[split]["cam_idx"]) if c == cam_idx
        ]
        for k in metadata[split]:
            metadata[split][k] = _sample_list(metadata[split][k], keep)
    return metadata


def sample_metadata_by_idxs(metadata: dict, sample_idxs, val_num: int = 5) -> dict:
    for split in metadata:
        if split == "train":
            idxs = sample_idxs
        else:
            idxs = (sample_idxs or list(range(val_num)))[:val_num]
        if idxs is None:
            continue
        for k in metadata[split]:
            metadata[split][k] = _sample_list(metadata[split][k], idxs)
    return metadata


def sample_metadata_by_training_ids(
    metadata: dict, training_ids, assign_pos: dict | None = None,
    assign_rot: dict | None = None,
) -> dict:
    """Subset the train split to named images; optionally hand-reassign
    positions and yzx-euler rotations per image (the reference's pose
    hand-tuning hook, load_waymo.py:110-139)."""
    if not training_ids:
        return metadata
    files = metadata["train"]["file_path"]
    keep = []
    for ele in training_ids:
        fp = f"images_train/{ele}.png"
        if fp in files:
            keep.append(files.index(fp))
    assert keep, "No image selected by training ids"
    for k in metadata["train"]:
        metadata["train"][k] = _sample_list(metadata["train"][k], keep)
    if assign_pos:
        from scipy.spatial.transform import Rotation as R

        files = metadata["train"]["file_path"]
        for ele, pos in assign_pos.items():
            fp = f"images_train/{ele}.png"
            if fp not in files:
                continue
            i = files.index(fp)
            metadata["train"]["position"][i] = list(pos)
            c2w = np.array(metadata["train"]["cam2world"][i])
            c2w[:3, 3] = np.asarray(pos)
            if assign_rot and ele in assign_rot:
                c2w[:3, :3] = R.from_euler(
                    "yzx", assign_rot[ele], degrees=True
                ).as_matrix()
            metadata["train"]["cam2world"][i] = c2w.tolist()
    return metadata


def _rot_euler(mat, seq="yzx"):
    from scipy.spatial.transform import Rotation as R

    return R.from_matrix(mat).as_euler(seq, degrees=True)


def gen_rotational_trajs(tr_c2w, train_HW, tr_K, tr_cam_idx, train_pos,
                         test_num: int = 200, rotate_interval: float = -0.3,
                         forward_dis_max: float = 0.03):
    """Rotating-forward synthetic test path (waymo_traj.py:44-87)."""
    from scipy.spatial.transform import Rotation as R

    start_c2w = np.array(tr_c2w[0])
    base_pos = train_pos[0]
    base_rot = R.from_matrix(start_c2w[:3, :3])
    all_rot_yzx = [base_rot.as_euler("yzx", degrees=True)]
    for _ in range(test_num - 1):
        prev = all_rot_yzx[-1]
        all_rot_yzx.append([prev[0] + rotate_interval, prev[1], prev[2]])
    all_rot = [R.from_euler("yzx", r, degrees=True).as_matrix() for r in all_rot_yzx]

    all_c2ws, test_pos = [], []
    for i in range(test_num):
        c2w = start_c2w.copy()
        c2w[:3, :3] = all_rot[i]
        fwd = (1 - np.cos(i / test_num * np.pi / 2)) * forward_dis_max
        pos = [base_pos[0] - fwd, base_pos[1], base_pos[2]]
        c2w[:3, 3] = pos
        all_c2ws.append(c2w)
        test_pos.append(pos)
    test_HW = [train_HW[0]] * test_num
    test_K = [tr_K[0]] * test_num
    test_cam_idxs = [tr_cam_idx[0]] * test_num
    return all_c2ws, test_HW, test_K, test_cam_idxs, test_pos


def gen_straight_trajs(tr_c2w, train_HW, tr_K, tr_cam_idx,
                       test_num: int = 100, rotate_angle: float = 2.0,
                       rot_freq: int = 20):
    """Straight path with sinusoidal yaw wobble (waymo_traj.py:28-41)."""
    from scipy.spatial.transform import Rotation as R

    all_c2ws = [np.array(c) for c in tr_c2w[:test_num]]
    for i, c2w in enumerate(all_c2ws):
        ang = rotate_angle * np.sin(i / rot_freq * 2 * np.pi)
        rot = R.from_euler("y", ang, degrees=True).as_matrix()
        c2w[:3, :3] = c2w[:3, :3] @ rot
    n = len(all_c2ws)
    return all_c2ws, [train_HW[0]] * n, [tr_K[0]] * n, [tr_cam_idx[0]] * n


def resize_imgs_to_common(train_HW, val_HW, imgs, tr_K, val_K, factor: int = 1):
    """Downscale images + intrinsics by an integer factor (resize_img,
    load_waymo.py:213-251 — the reference resizes to a target max side)."""
    if factor == 1:
        return train_HW, val_HW, imgs, tr_K, val_K
    import cv2

    out_imgs = []
    for im in imgs:
        h, w = im.shape[:2]
        out_imgs.append(
            cv2.resize(im, (w // factor, h // factor), interpolation=cv2.INTER_AREA)
        )
    scale = 1.0 / factor
    scale_K = lambda K: (np.asarray(K, np.float64) * np.array([[scale], [scale], [1.0]])).tolist()
    train_HW = [[h // factor, w // factor] for h, w in train_HW]
    val_HW = [[h // factor, w // factor] for h, w in val_HW]
    tr_K = [scale_K(K) for K in tr_K]
    val_K = [scale_K(K) for K in val_K]
    return train_HW, val_HW, out_imgs, tr_K, val_K


def inward_nearfar_heuristic(cam_o: np.ndarray, ratio: float = 0.05):
    dist = np.linalg.norm(cam_o[:, None] - cam_o, axis=-1)
    far = dist.max()
    return far * ratio, far


def load_waymo_data(
    datadir: str,
    sample_cam: int | None = None,
    sample_idxs=None,
    sample_num: int = -1,
    sample_interval: int = 1,
    training_ids=None,
    # NOTE: accepted for config parity but UNUSED — the reference's
    # gen_rotational_trajs takes rotate_angle and never reads it
    # (waymo_traj.py:44-87 hardcodes test_num=200, interval=-0.3deg);
    # we mirror that behavior so test trajectories match
    test_rotate_angle: float = 9.0,
    load_img: bool = True,
    near: float | None = None,
    far: float | None = None,
    near_clip: float | None = None,
    diffuse_map: dict | None = None,
    diff_root: str = "diffusion",
) -> dict:
    """Full waymo data_dict (load_waymo.py:263-405).

    ``diffuse_map``: {image_stem: replacement_stem} — swap training images
    for diffusion-generated replacements under ``diff_root`` (the
    reference's --diffuse flag, load_waymo.py:287-293)."""
    with open(os.path.join(datadir, "metadata.json")) as fp:
        metadata = json.load(fp)
    if sample_cam is not None:
        metadata = sample_metadata_by_cam(metadata, sample_cam)
    if sample_num > 0:
        sample_idxs = list(range(0, sample_num * sample_interval, sample_interval))
    metadata = sort_metadata_by_pos(metadata)
    metadata = sample_metadata_by_idxs(metadata, sample_idxs)
    metadata = sample_metadata_by_training_ids(metadata, training_ids)
    if diffuse_map:
        fps = metadata["train"]["file_path"]
        for idx, fp in enumerate(fps):
            stem = os.path.basename(fp).replace(".png", "")
            if stem in diffuse_map:
                fps[idx] = os.path.join(diff_root, diffuse_map[stem] + ".png")

    tr, val = metadata["train"], metadata["val"]
    tr_c2w, val_c2w = tr["cam2world"], val["cam2world"]
    tr_K, val_K = tr["K"], val["K"]
    tr_cam_idx = tr["cam_idx"]
    train_pos = tr["position"]

    i_split = [
        list(range(len(tr_c2w))),
        list(range(len(tr_c2w), len(tr_c2w) + len(val_c2w))),
        [],
    ]
    poses = [np.array(c).reshape(4, 4) for c in tr_c2w + val_c2w]

    imgs = []
    if load_img:
        for path in tr["file_path"] + val["file_path"]:
            imgs.append(_imread(os.path.join(datadir, path)) / 255.0)

    train_HW = [[tr["height"][i], tr["width"][i]] for i in range(len(tr["height"]))]
    val_HW = [[val["height"][i], val["width"][i]] for i in range(len(val["height"]))]

    te_c2w, test_HW, test_K, test_cam_idxs, _ = gen_rotational_trajs(
        tr_c2w, train_HW, tr_K, tr_cam_idx, train_pos
    )
    base = len(poses)
    i_split[2] = list(range(base, base + len(te_c2w)))
    poses += [np.array(c).reshape(4, 4) for c in te_c2w]

    Ks = np.array(tr_K + val_K + test_K)
    HW = np.array(train_HW + val_HW + test_HW)
    poses = np.stack(poses).astype(np.float32)
    images = np.stack(imgs).astype(np.float32) if imgs else None

    i_train = np.array(i_split[0])
    nc, f = inward_nearfar_heuristic(poses[i_train, :3, 3], ratio=0.02)
    near_out = 0.0 if near is None else near
    far_out = f if far is None else far
    near_clip_out = nc if near_clip is None else near_clip

    return dict(
        HW=HW,
        Ks=Ks,
        near=near_out,
        far=far_out,
        near_clip=near_clip_out,
        i_train=i_train,
        i_val=np.array(i_split[1]),
        i_test=np.array(i_split[2]),
        poses=poses,
        render_poses=np.stack([np.array(c) for c in te_c2w]).astype(np.float32),
        images=images,
        depths=None,
        cam_idxs=tr_cam_idx + val["cam_idx"] + test_cam_idxs,
        irregular_shape=False,
    )
