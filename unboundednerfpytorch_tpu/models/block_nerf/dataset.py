"""Block-NeRF Waymo dataset: per-block ray stores.

Re-implements ``/root/reference/block_nerf/waymo_dataset.py`` numpy-first:
reads ``split_block_{split}.json`` + per-image metadata (c2w, intrinsics,
equivalent_exposure), builds the [N, 10+1] ray store
(o, d, radii, exposure, near, far, appearance id) with the mip-NeRF pixel
radius dx·2/√12, for the per-block training above.

Metadata is accepted as a plain dict (``{image_name: {c2w, intrinsics, W, H,
equivalent_exposure, image_name}}``) loaded from json — the torch ``.pt``
metadata of the reference preprocessing is converted by
``data_preprocess`` tooling.
"""

from __future__ import annotations

import json
import os

import numpy as np


def get_ray_directions(H: int, W: int, K: np.ndarray) -> np.ndarray:
    """Pixel-center camera-frame directions, OpenCV x-right/y-down/z-forward
    with the NeRF -y/-z flip (waymo_dataset.py:13-25)."""
    j, i = np.mgrid[0:H, 0:W].astype(np.float32)
    return np.stack(
        [
            (i - K[0, 2] + 0.5) / K[0, 0],
            -(j - K[1, 2] + 0.5) / K[1, 1],
            -np.ones_like(i),
        ],
        axis=-1,
    )


def get_rays(directions: np.ndarray, c2w: np.ndarray):
    rays_d = directions @ c2w[:3, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def pixel_radii(rays_d: np.ndarray, H: int, W: int) -> np.ndarray:
    """mip-NeRF base radius: neighbor-direction distance * 2/sqrt(12)
    (waymo_dataset.py:141-143)."""
    d = rays_d.reshape(H, W, 3)
    dx = np.sqrt(np.sum((d[:-1] - d[1:]) ** 2, -1))
    dx = np.concatenate([dx, dx[-2:-1]], 0)
    return (dx * 2 / np.sqrt(12)).reshape(-1, 1)


def build_image_rays(
    img_info: dict,
    rgb: np.ndarray | None,
    appearance_id: int,
    img_downscale: int = 4,
    near: float = 0.01,
    far: float = 15.0,
):
    """One image → (rays [HW, 10], rgbs [HW, 3] | None, ts [HW])."""
    W = int(img_info["W"]) // img_downscale
    H = int(img_info["H"]) // img_downscale
    K = np.zeros((3, 3), np.float32)
    K[0, 0] = img_info["intrinsics"][0] // img_downscale
    K[1, 1] = img_info["intrinsics"][1] // img_downscale
    K[0, 2] = W * 0.5
    K[1, 2] = H * 0.5
    K[2, 2] = 1.0
    c2w = np.asarray(img_info["c2w"], np.float32)

    dirs = get_ray_directions(H, W, K)
    rays_o, rays_d = get_rays(dirs, c2w)
    radii = pixel_radii(rays_d, H, W)
    n = rays_o.shape[0]
    ones = np.ones((n, 1), np.float32)
    rays = np.concatenate(
        [
            rays_o,
            rays_d,
            radii,
            float(img_info["equivalent_exposure"]) * ones,
            near * ones,
            far * ones,
        ],
        axis=-1,
    ).astype(np.float32)
    ts = np.full((n,), appearance_id, np.int32)
    if rgb is not None:
        import cv2

        if rgb.shape[0] != H or rgb.shape[1] != W:
            rgb = cv2.resize(rgb, (W, H), interpolation=cv2.INTER_LANCZOS4)
        rgb = rgb.reshape(-1, 3).astype(np.float32)
    return rays, rgb, ts, (H, W)


def load_block_ray_store(
    root_dir: str,
    block: str = "block_0",
    split: str = "train",
    img_downscale: int = 4,
    near: float = 0.01,
    far: float = 15.0,
):
    """Load all rays for one block's training split (waymo_dataset.py:98-180).

    Expects ``{split}/split_block_{split}.json`` and
    ``{split}/{split}_all_meta.json`` plus ``{split}/rgbs/{image_name}.png``.
    Returns ({"rays", "rgbs", "ts"}, n_images).
    """
    import imageio.v2 as imageio

    with open(os.path.join(root_dir, split, f"split_block_{split}.json")) as fp:
        block_split = json.load(fp)
    meta_path = os.path.join(root_dir, split, f"{split}_all_meta.json")
    with open(meta_path) as fp:
        meta = json.load(fp)

    all_rays, all_rgbs, all_ts = [], [], []
    elements = block_split[block]["elements"]
    for img_name, appearance_id in elements:
        img_info = meta[img_name]
        img_path = os.path.join(root_dir, split, "rgbs", img_info["image_name"] + ".png")
        rgb = np.asarray(imageio.imread(img_path))[..., :3] / 255.0
        rays, rgbs, ts, _ = build_image_rays(
            img_info, rgb, appearance_id, img_downscale, near, far
        )
        all_rays.append(rays)
        all_rgbs.append(rgbs)
        all_ts.append(ts)
    return (
        {
            "rays": np.concatenate(all_rays),
            "rgbs": np.concatenate(all_rgbs),
            "ts": np.concatenate(all_ts),
        },
        len(elements),
    )


def find_nearest_appearance_idx(img_source: dict, block_elements, meta: dict):
    """Nearest trained appearance id for a view NOT in the block's training
    set (waymo_dataset.py:46-60): among the block's elements taken by the
    SAME camera, the one whose origin is closest to the query view's."""
    cam_idx = img_source.get("cam_idx")
    best_d, best_idx = float("inf"), None
    for name, app_id in block_elements:
        info = meta[name]
        if info.get("cam_idx") != cam_idx:
            continue
        d = float(np.linalg.norm(
            np.asarray(img_source["origin_pos"], np.float64)
            - np.asarray(info["origin_pos"], np.float64)
        ))
        if d < best_d:
            best_d, best_idx = d, app_id
    return best_idx


def load_val_rays(
    root_dir: str,
    block: str = "block_0",
    img_downscale: int = 4,
    near: float = 0.01,
    far: float = 15.0,
    max_views: int = 5,
):
    """The reference's ``val`` split (waymo_dataset.py:198-276): whole-image
    ray batches + GT for the first <= ``max_views`` images of the block,
    read from ``val/rgbs``. Yields (rays, rgbs, ts, (H, W), image_name)."""
    import json as _json

    import imageio.v2 as imageio

    with open(os.path.join(root_dir, "val", "split_block_val.json")) as fp:
        block_split = _json.load(fp)
    with open(os.path.join(root_dir, "val", "val_all_meta.json")) as fp:
        meta = _json.load(fp)
    out = []
    for img_name, app_id in block_split[block]["elements"][:max_views]:
        info = meta[img_name]
        path = os.path.join(
            root_dir, "val", "rgbs", info["image_name"] + ".png"
        )
        rgb = np.asarray(imageio.imread(path))[..., :3] / 255.0
        rays, rgbs, ts, hw = build_image_rays(
            info, rgb, app_id, img_downscale, near, far
        )
        out.append((rays, rgbs, ts, hw, img_name))
    return out


def gen_test_rays(
    img_info: dict,
    appearance_id: int,
    n_frames: int = 10,
    dy_max: float = 0.2,
    img_downscale: int = 4,
    near: float = 0.01,
    far: float = 15.0,
):
    """The reference's ``test`` split (waymo_dataset.py:177-180, 276+): a
    short novel trajectory sliding the camera y by linspace(0, dy_max) from
    a source view. Yields (rays, ts, (H, W)) per frame."""
    out = []
    for dy in np.linspace(0.0, dy_max, n_frames):
        info = dict(img_info)
        c2w = np.asarray(img_info["c2w"], np.float32).copy()
        c2w[1, 3] += dy
        info["c2w"] = c2w
        rays, _, ts, hw = build_image_rays(
            info, None, appearance_id, img_downscale, near, far
        )
        out.append((rays, ts, hw))
    return out


def gen_compose_rays(
    meta: dict,
    cam_begin: str,
    cam_end: str,
    appearance_id: int,
    frame_step: float = 0.01,
    img_downscale: int = 4,
    near: float = 0.01,
    far: float = 15.0,
    max_frames: int = 1000,
):
    """The reference's ``compose`` split (waymo_dataset.py:181-194): frames
    interpolated between two cameras, one per ``frame_step`` units of
    y-distance (the block-compositing demo-video trajectory). Yields
    (rays, ts, (H, W)) per frame."""
    a = meta[cam_begin]
    b = meta[cam_end]
    delta = np.asarray(a["origin_pos"], np.float64) - np.asarray(
        b["origin_pos"], np.float64
    )
    n_frames = 1 if abs(delta[1]) < frame_step else int(
        abs(delta[1]) // frame_step
    )
    n_frames = min(n_frames, max_frames)
    c2w_a = np.asarray(a["c2w"], np.float64)
    c2w_b = np.asarray(b["c2w"], np.float64)
    out = []
    for k in range(n_frames):
        s = k / max(n_frames - 1, 1)
        info = dict(a)
        c2w = c2w_a.copy()
        # translate along the begin->end segment (rotation held at the
        # begin view's, like the reference's y-slide)
        c2w[:3, 3] = (1 - s) * c2w_a[:3, 3] + s * c2w_b[:3, 3]
        info["c2w"] = c2w.astype(np.float32)
        rays, _, ts, hw = build_image_rays(
            info, None, appearance_id, img_downscale, near, far
        )
        out.append((rays, ts, hw))
    return out
