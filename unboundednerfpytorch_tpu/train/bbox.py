"""Scene-bounds computation.

Re-implements ``/root/reference/FourierGrid/bbox_compute.py``: camera-frustum
bboxes for bounded / unbounded / waymo / mega scenes and the coarse-geometry
bbox used between training stages — vmapped over views instead of a Python
loop per image.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import rays as ray_ops


def _frustum_points(HW, Ks, poses, ndc, inverse_y, flip_x, flip_y):
    """Per-view ray bundles (assumes uniform H, W across views)."""
    H, W = int(HW[0][0]), int(HW[0][1])

    def one(K, c2w):
        return ray_ops.get_rays_of_a_view(
            H, W, K, c2w, ndc=ndc, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y
        )

    return jax.vmap(one)(jnp.asarray(Ks), jnp.asarray(poses)[:, :3, :4])


def bbox_bounded(HW, Ks, poses, near, far, *, ndc=False, inverse_y=False,
                 flip_x=False, flip_y=False):
    """Bounded scenes: sweep near/far points of every ray (bbox_compute.py:96-110)."""
    rays_o, rays_d, viewdirs = _frustum_points(HW, Ks, poses, ndc, inverse_y, flip_x, flip_y)
    d = rays_d if ndc else viewdirs
    pts = jnp.stack([rays_o + d * near, rays_o + d * far])
    return (
        np.asarray(pts.min(axis=(0, 1, 2, 3))),
        np.asarray(pts.max(axis=(0, 1, 2, 3))),
    )


def bbox_unbounded(HW, Ks, poses, near_clip, unbounded_inner_r, *, ndc=False,
                   inverse_y=False, flip_x=False, flip_y=False):
    """Unbounded inward scenes: cube around near-clip points of all cameras
    scaled by unbounded_inner_r (bbox_compute.py:10-26)."""
    rays_o, rays_d, _ = _frustum_points(HW, Ks, poses, ndc, inverse_y, flip_x, flip_y)
    pts = rays_o + rays_d * near_clip
    xyz_min = pts.min(axis=(0, 1, 2))
    xyz_max = pts.max(axis=(0, 1, 2))
    center = (xyz_min + xyz_max) * 0.5
    radius = (center - xyz_min).max() * unbounded_inner_r
    return np.asarray(center - radius), np.asarray(center + radius)


def bbox_waymo(poses, unbounded_inner_r, x_extend=0.05, y_extend=0.01, z_extend=0.01):
    """Waymo: camera-position extents + fixed margins, cubified
    (bbox_compute.py:48-75)."""
    cams = np.asarray(poses)[:, :3, 3]
    xyz_min = cams.min(0) - np.array([x_extend, y_extend, z_extend])
    xyz_max = cams.max(0) + np.array([x_extend, y_extend, z_extend])
    center = (xyz_min + xyz_max) * 0.5
    radius = (center - xyz_min).max() * unbounded_inner_r
    return center - radius, center + radius


def bbox_mega(poses, unbounded_inner_r, boundary_ratio):
    """Mega-NeRF: camera extents + proportional margins (bbox_compute.py:78-93)."""
    cams = np.asarray(poses)[:, :3, 3]
    dist = np.abs(cams.max(0) - cams.min(0))
    xyz_min = cams.min(0) - boundary_ratio * dist
    xyz_max = cams.max(0) + boundary_ratio * dist
    center = (xyz_min + xyz_max) * 0.5
    radius = (center - xyz_min).max() * unbounded_inner_r
    return center - radius, center + radius


def compute_bbox_by_cam_frustrm(cfg, data_dict, model_name: str | None = None):
    """Dispatch mirroring bbox_compute.py:113-133."""
    d = cfg.data
    i_train = data_dict["i_train"]
    HW = np.asarray(data_dict["HW"])[i_train]
    Ks = np.asarray(data_dict["Ks"])[i_train]
    poses = np.asarray(data_dict["poses"])[i_train]
    if d.dataset_type == "waymo":
        return bbox_waymo(poses, d.unbounded_inner_r)
    if d.dataset_type == "mega":
        return bbox_mega(poses, d.unbounded_inner_r, d.boundary_ratio)
    if d.dataset_type == "nerfpp" or model_name == "FourierGrid":
        return bbox_unbounded(
            HW, Ks, poses, data_dict.get("near_clip") or data_dict["near"],
            d.unbounded_inner_r, ndc=d.ndc, inverse_y=d.inverse_y,
            flip_x=d.flip_x, flip_y=d.flip_y,
        )
    if d.unbounded_inward:
        return bbox_unbounded(
            HW, Ks, poses, data_dict.get("near_clip") or data_dict["near"],
            d.unbounded_inner_r, ndc=d.ndc, inverse_y=d.inverse_y,
            flip_x=d.flip_x, flip_y=d.flip_y,
        )
    return bbox_bounded(
        HW, Ks, poses, data_dict["near"], data_dict["far"],
        ndc=d.ndc, inverse_y=d.inverse_y, flip_x=d.flip_x, flip_y=d.flip_y,
    )


def compute_bbox_by_coarse_geo(params, cfg, activate_fn, thres: float):
    """Fine-stage bbox from thresholded coarse density (bbox_compute.py:136-165).

    params/cfg: coarse model; activate_fn(density)->alpha on the dense grid.
    """
    ws = cfg.world_size
    interp = jnp.stack(
        jnp.meshgrid(
            *[jnp.linspace(0, 1, int(n)) for n in ws], indexing="ij"
        ),
        -1,
    )
    mn = jnp.asarray(cfg.xyz_min)
    mx = jnp.asarray(cfg.xyz_max)
    dense_xyz = mn * (1 - interp) + mx * interp
    density = params.density(dense_xyz)[..., 0]
    alpha = activate_fn(density)
    mask = alpha > thres
    mask = jnp.where(jnp.any(mask), mask, alpha > -1.0)
    big = jnp.asarray(np.inf, dense_xyz.dtype)
    masked = jnp.where(mask[..., None], dense_xyz, big)
    xyz_min = masked.reshape(-1, 3).min(0)
    masked = jnp.where(mask[..., None], dense_xyz, -big)
    xyz_max = masked.reshape(-1, 3).max(0)
    return np.asarray(xyz_min), np.asarray(xyz_max)
