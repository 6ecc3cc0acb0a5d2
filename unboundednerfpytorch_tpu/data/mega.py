"""Mega-NeRF (building / rubble / quad) metadata loader.

Behavioral parity with ``/root/reference/FourierGrid/load_mega.py``: the same
metadata.json pattern as Waymo plus most-common-shape filtering and a
mega-specific rotational test path.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import numpy as np

from unboundednerfpytorch_tpu.data.waymo import (
    _imread,
    _sample_list,
    inward_nearfar_heuristic,
    sample_metadata_by_cam,
    sample_metadata_by_idxs,
)


def sort_metadata_by_pos(metadata: dict) -> dict:
    """Mega variant sorts only the train split by c2w position (load_mega.py:91-106)."""
    positions = [np.array(c)[ :3, 3] for c in metadata["train"]["cam2world"]]
    idxs = list(range(len(positions)))
    order = [
        i
        for i, _ in sorted(
            zip(idxs, positions), key=lambda row: (row[1][1], row[1][0])
        )
    ]
    for k in metadata["train"]:
        metadata["train"][k] = _sample_list(metadata["train"][k], order)
    return metadata


def sample_metadata_by_shape(metadata: dict) -> dict:
    """Keep only images of the most common (w, h) (load_mega.py:69-79)."""
    wh = list(zip(metadata["train"]["width"], metadata["train"]["height"]))
    most = Counter(wh).most_common(1)[0][0]
    for split in metadata:
        cur = list(zip(metadata[split]["width"], metadata[split]["height"]))
        keep = [i for i, s in enumerate(cur) if s == most]
        for k in metadata[split]:
            metadata[split][k] = _sample_list(metadata[split][k], keep)
    return metadata


def gen_rotational_trajs(tr_c2w, train_HW, tr_K, test_num: int = 100,
                         rotate_interval: float = -0.3):
    from scipy.spatial.transform import Rotation as R

    start_c2w = np.array(tr_c2w[0])
    base_rot = R.from_matrix(start_c2w[:3, :3])
    rots = [base_rot.as_euler("yzx", degrees=True)]
    for _ in range(test_num - 1):
        prev = rots[-1]
        rots.append([prev[0] + rotate_interval, prev[1], prev[2]])
    all_c2ws = []
    for r in rots:
        c2w = start_c2w.copy()
        c2w[:3, :3] = R.from_euler("yzx", r, degrees=True).as_matrix()
        all_c2ws.append(c2w)
    n = len(all_c2ws)
    return all_c2ws, [train_HW[0]] * n, [tr_K[0]] * n


def load_mega_data(
    datadir: str,
    sample_cam: int | None = None,
    sample_idxs=None,
    sample_num: int = -1,
    sample_interval: int = 1,
    load_img: bool = True,
    near: float | None = None,
    far: float | None = None,
    near_clip: float | None = None,
) -> dict:
    with open(os.path.join(datadir, "metadata.json")) as fp:
        metadata = json.load(fp)
    if sample_cam is not None:
        metadata = sample_metadata_by_cam(metadata, sample_cam)
    if sample_num > 0:
        sample_idxs = list(range(0, sample_num * sample_interval, sample_interval))
    metadata = sort_metadata_by_pos(metadata)
    metadata = sample_metadata_by_shape(metadata)
    if sample_idxs is not None:
        for split in metadata:
            for k in metadata[split]:
                metadata[split][k] = _sample_list(metadata[split][k], sample_idxs)

    tr, val = metadata["train"], metadata["val"]
    tr_c2w, val_c2w = tr["cam2world"], val["cam2world"]
    tr_K, val_K = tr["K"], val["K"]

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

    te_c2w, test_HW, test_K = gen_rotational_trajs(tr_c2w, train_HW, tr_K)
    base = len(poses)
    i_split[2] = list(range(base, base + len(te_c2w)))
    poses += [np.array(c).reshape(4, 4) for c in te_c2w]

    Ks = np.array(tr_K + val_K + test_K)
    HW = np.array([[int(h), int(w)] for h, w in train_HW + val_HW + test_HW])
    poses = np.stack(poses).astype(np.float32)
    images = np.stack(imgs).astype(np.float32) if imgs else None

    i_train = np.array(i_split[0])
    nc, f = inward_nearfar_heuristic(poses[i_train, :3, 3], ratio=0.02)
    return dict(
        HW=HW,
        Ks=Ks,
        near=0.0 if near is None else near,
        far=f if far is None else far,
        near_clip=nc if near_clip is None else near_clip,
        i_train=i_train,
        i_val=np.array(i_split[1]),
        i_test=np.array(i_split[2]),
        poses=poses,
        render_poses=np.stack([np.array(c) for c in te_c2w]).astype(np.float32),
        images=images,
        depths=None,
        irregular_shape=False,
    )
