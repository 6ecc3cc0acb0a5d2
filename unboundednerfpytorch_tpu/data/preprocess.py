"""Waymo Block-NeRF preprocessing: TFRecord decode + block splitting.

Re-implements ``/root/reference/data_preprocess/``:
  * :func:`decode_waymo_tfrecords` — decode the official Waymo Block-NeRF
    release (image, ray origins/dirs, intrinsics, exposure) and recover the
    c2w rotation from the stored per-pixel ray directions by least squares
    (``fetch_data_from_tf_record.py:28-77``). Tensorflow-free: uses the
    native TFRecord/tf.Example reader (:mod:`..data.tfrecord`).
  * :func:`solve_block_diameter` — Newton solve for the centroid spacing
    giving a target circle-overlap ratio (``split_block.py:54-73``);
  * :func:`split_blocks` — camera-origin-radius block assignment with
    overlap (``split_block.py:76-120``).
"""

from __future__ import annotations

import json
import os

import numpy as np


# ---------------------------------------------------------------------------
# Block splitting (pure numpy)
# ---------------------------------------------------------------------------

def solve_block_diameter(r: float = 2.0, overlap: float = 0.5) -> float:
    """Distance 2x between circle centers of radius r whose lens-shaped
    intersection is `overlap` of a circle's area — Newton iteration on
    2·acos(x/r)·r² − 2x·√(r²−x²) = overlap·π·r² (split_block.py:54-73)."""
    x = r * 0.9
    x0 = x + 1.0
    while abs(x - x0) >= 1e-6:
        x0 = x
        f = (
            2 * np.arccos(x0 / r) * r**2
            - 2 * x0 * np.sqrt(r**2 - x0**2)
            - overlap * np.pi * r**2
        )
        fd = (2 * x0**2 - 2 * r**2) / np.sqrt(r**2 - x0**2) - 2 * np.sqrt(
            r**2 - x0**2
        )
        x = x0 - f / fd
    return 2 * x


def sort_origins_by_pos(img_origins: dict) -> dict:
    """Sort {image_name: origin} by (y, x) origin position."""
    items = sorted(img_origins.items(), key=lambda kv: (kv[1][1], kv[1][0]))
    return dict(items)


def block_elements_within(img_origins: dict, centroid_name: str, radius: float):
    """[ [image_name, running-index] ] for origins within radius of the
    centroid image (split_block.py:77-88)."""
    out = []
    idx = 0
    c = np.asarray(img_origins[centroid_name])
    for name, origin in img_origins.items():
        if np.linalg.norm(c - np.asarray(origin)) <= radius:
            out.append([name, idx])
            idx += 1
    return out


def split_blocks(
    img_origins: dict,
    radius: float = 2.0,
    overlap: float = 0.5,
) -> dict:
    """Assign images to overlapping blocks along the (sorted) trajectory.

    Returns {block_i: {"centroid": [x,y,z], "elements": [[name, idx], ...]}}
    — the ``split_block_train.json`` structure consumed by Block-NeRF
    training and composed inference.
    """
    origins = sort_origins_by_pos(img_origins)
    names = list(origins.keys())
    spacing = solve_block_diameter(radius, overlap)

    blocks = {}
    block_id = 0
    i = 0
    while i < len(names):
        centroid_name = names[i]
        elements = block_elements_within(origins, centroid_name, radius)
        blocks[f"block_{block_id}"] = {
            "centroid": list(np.asarray(origins[centroid_name], dtype=float)),
            "elements": elements,
        }
        block_id += 1
        # advance to the first origin farther than the overlap spacing
        j = i + 1
        c = np.asarray(origins[centroid_name])
        while j < len(names) and np.linalg.norm(
            c - np.asarray(origins[names[j]])
        ) < spacing:
            j += 1
        if j == i + 1 and j < len(names):
            j += 1
        if j >= len(names):
            break
        i = j
    return blocks


def write_block_split(blocks: dict, out_path: str) -> None:
    with open(out_path, "w") as f:
        json.dump(blocks, f, indent=2)


# ---------------------------------------------------------------------------
# Per-block metadata extraction (get_one_block_meta_and_visualize.py)
# ---------------------------------------------------------------------------

def get_pix2cam(focals, width, height):
    """Inverse-intrinsics stack (get_one_block_meta_and_visualize.py:12-25)."""
    fx = np.asarray(focals, np.float64)
    fy = np.asarray(focals, np.float64)
    cx = np.asarray(width, np.float64) * 0.5
    cy = np.asarray(height, np.float64) * 0.5
    arr0 = np.zeros_like(cx)
    arr1 = np.ones_like(cx)
    k_inv = np.array([
        [arr1 / fx, arr0, -cx / fx],
        [arr0, -arr1 / fy, cy / fy],
        [arr0, arr0, -arr1],
    ])
    return np.moveaxis(k_inv, -1, 0).tolist()


def extract_block_meta(
    root_dir: str,
    block_index: int,
    out_dir: str,
    near: float = 0.01,
    far: float = 15.0,
    copy_images: bool = True,
) -> dict:
    """Assemble one block's unified metadata.json + image folders from the
    preprocessed Waymo dataset (get_one_block_meta_and_visualize.py:28-99):
    reads split_block_{train,val}.json + {split}_all_meta.json, copies the
    block's images into images_{train,val,test}/ and writes the per-split
    {file_path, cam2world, width, height, focal, pix2cam, lossmult, near,
    far} dict (the format data/waymo.py consumes)."""
    import shutil

    with open(os.path.join(root_dir, "train", "split_block_train.json")) as f:
        train_split = json.load(f)
    with open(os.path.join(root_dir, "train", "train_all_meta.json")) as f:
        train_meta = json.load(f)
    with open(os.path.join(root_dir, "val", "split_block_val.json")) as f:
        val_split = json.load(f)
    with open(os.path.join(root_dir, "val", "val_all_meta.json")) as f:
        val_meta = json.load(f)

    key = f"block_{block_index}"
    train_imgs = train_split[key]["elements"]
    val_entry = val_split[key]
    val_imgs = val_entry["elements"] if isinstance(val_entry, dict) else val_entry

    def form_unified(images, all_meta, save_prefix, split_prefix):
        out = {k: [] for k in (
            "file_path", "cam2world", "width", "height", "focal",
        )}
        nears, fars = [], []
        os.makedirs(os.path.join(out_dir, save_prefix), exist_ok=True)
        for idx, one_img in enumerate(images):
            name = one_img[0] if isinstance(one_img, (list, tuple)) else one_img
            m = all_meta[name]
            final_path = os.path.join(
                save_prefix, f"{m['cam_idx']}_{idx}.png"
            )
            if copy_images:
                src = os.path.join(
                    root_dir, split_prefix, "rgbs", name + ".png"
                )
                if os.path.exists(src):
                    shutil.copyfile(src, os.path.join(out_dir, final_path))
            c2w = [list(r) for r in m["c2w"]]
            if len(c2w) == 3:
                c2w.append([0.0, 0.0, 0.0, 1.0])
            out["file_path"].append(final_path)
            out["cam2world"].append(c2w)
            out["width"].append(m["W"])
            out["height"].append(m["H"])
            out["focal"].append(m["intrinsics"][0])
            nears.append(near)
            fars.append(far)
        out["pix2cam"] = get_pix2cam(out["focal"], out["width"], out["height"])
        out["lossmult"] = [1.0] * len(out["height"])
        out["near"] = nears
        out["far"] = fars
        return out

    os.makedirs(out_dir, exist_ok=True)
    train_dict = form_unified(train_imgs, train_meta, "images_train", "train")
    val_dict = form_unified(val_imgs, val_meta, "images_val", "val")
    test_dict = form_unified(val_imgs, val_meta, "images_test", "val")
    # waymo has no test split: test = val (:95-96)
    unified = {"train": train_dict, "val": val_dict, "test": test_dict}
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(unified, f)
    return unified


# ---------------------------------------------------------------------------
# TFRecord decode (tensorflow-free)
# ---------------------------------------------------------------------------

def recover_rotation_from_rays(cam_dirs: np.ndarray, world_dirs: np.ndarray) -> np.ndarray:
    """Least-squares c2w rotation R with world ≈ cam @ R^T
    (fetch_data_from_tf_record.py:57-77): solve via SVD of the correlation."""
    A = cam_dirs.reshape(-1, 3)
    B = world_dirs.reshape(-1, 3)
    H = A.T @ B
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    return Vt.T @ D @ U.T


def decode_waymo_tfrecords(
    tfrecord_paths: list[str],
    out_dir: str,
    splits: tuple = ("train", "val"),
) -> dict:
    """Decode the Waymo Block-NeRF TFRecords into images + metadata.json
    (the format consumed by :mod:`unboundednerfpytorch_tpu.data.waymo`).

    Tensorflow-free: record framing + tf.Example parsing via
    :mod:`unboundednerfpytorch_tpu.data.tfrecord` (native C++ framing with
    pure-python fallback), PNG decode via imageio."""
    import imageio.v2 as iio

    from unboundednerfpytorch_tpu.data import tfrecord as tfr

    metadata = {s: {
        "file_path": [], "cam2world": [], "K": [], "width": [], "height": [],
        "position": [], "cam_idx": [], "equivalent_exposure": [],
    } for s in splits}

    for split in splits:
        os.makedirs(os.path.join(out_dir, f"images_{split}"), exist_ok=True)

    idx = 0
    for path in tfrecord_paths:
        split = "val" if "validation" in os.path.basename(path) else "train"
        for rec in tfr.read_records(path):
            b = tfr.parse_example(rec)
            h = int(b["height"][0])
            w = int(b["width"][0])
            K = np.asarray(b["intrinsics"], np.float32).tolist()
            origins = np.asarray(b["ray_origins"], np.float32).reshape(h, w, 3)
            dirs = np.asarray(b["ray_dirs"], np.float32).reshape(h, w, 3)
            img = iio.imread(b["image"][0])

            # camera-frame dirs from intrinsics; recover rotation by LS
            fx, fy = K[0], K[1]
            j, i = np.mgrid[0:h, 0:w].astype(np.float32)
            cam_dirs = np.stack(
                [(i - w / 2 + 0.5) / fx, -(j - h / 2 + 0.5) / fy, -np.ones_like(i)], -1
            )
            cam_dirs = cam_dirs / np.linalg.norm(cam_dirs, axis=-1, keepdims=True)
            world_dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
            R = recover_rotation_from_rays(cam_dirs, world_dirs)
            origin = origins.reshape(-1, 3).mean(0)
            c2w = np.eye(4)
            c2w[:3, :3] = R
            c2w[:3, 3] = origin

            name = f"{idx:06d}"
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(out_dir, f"images_{split}", name + ".png"), img
            )
            m = metadata[split]
            m["file_path"].append(f"images_{split}/{name}.png")
            m["cam2world"].append(c2w.tolist())
            m["K"].append(np.array(K[:9]).reshape(3, 3).tolist() if len(K) >= 9
                          else [[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
            m["width"].append(w)
            m["height"].append(h)
            m["position"].append(origin.tolist())
            m["cam_idx"].append(int(b["cam_idx"][0]))
            m["equivalent_exposure"].append(float(b["equivalent_exposure"][0]))
            idx += 1

    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f)
    return metadata
