"""Synthetic test scenes: a procedurally generated bounded scene with known
geometry, rendered into ground-truth images by this framework's own volume
renderer. Lets integration tests and benchmarks run end-to-end with zero
dataset downloads (the reference has no equivalent; its smallest config needs
the NeRF-synthetic lego download)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import rays as ray_ops


def look_at_pose(cam_pos: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """OpenGL-style c2w (camera looks down -z), as NeRF poses expect."""
    forward = target - cam_pos
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, dtype=np.float64))
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = cam_pos
    return c2w


def orbit_poses(n: int, radius: float = 3.0, elevation: float = 0.5) -> np.ndarray:
    """n camera poses orbiting the origin."""
    poses = []
    for k in range(n):
        theta = 2 * np.pi * k / n
        pos = np.array(
            [
                radius * np.cos(theta) * np.cos(elevation),
                radius * np.sin(theta) * np.cos(elevation),
                radius * np.sin(elevation),
            ]
        )
        poses.append(look_at_pose(pos, np.zeros(3)))
    return np.stack(poses).astype(np.float32)


def sphere_scene_images(
    n_views: int = 8,
    H: int = 48,
    W: int = 48,
    radius: float = 0.6,
    bg: float = 1.0,
):
    """Render a diffuse colored sphere (color = position-dependent) with a
    dense analytic volume integrator; returns (images [V,H,W,3], poses, K)."""
    poses = orbit_poses(n_views)
    focal = 1.2 * W
    K = np.array(
        [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], dtype=np.float32
    )

    def render_view(c2w):
        ro, rd, _ = ray_ops.get_rays_of_a_view(H, W, jnp.asarray(K), c2w)
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        t = jnp.linspace(2.0, 4.5, 192)
        pts = ro[:, None, :] + rd[:, None, :] * t[None, :, None]
        dist2 = jnp.sum(pts**2, axis=-1)
        density = jnp.where(dist2 < radius**2, 25.0, 0.0)
        dt = t[1] - t[0]
        alpha = 1.0 - jnp.exp(-density * dt * jnp.linalg.norm(rd, axis=-1)[:, None])
        t_excl = jnp.cumprod(1 - alpha + 1e-10, axis=-1) / (1 - alpha + 1e-10)
        w = t_excl * alpha
        color = jnp.clip(pts * 0.5 + 0.5, 0, 1)
        rgb = jnp.einsum("ns,nsc->nc", w, color) + (1 - w.sum(-1))[:, None] * bg
        return rgb.reshape(H, W, 3)

    render_all = jax.jit(jax.vmap(render_view))
    images = np.asarray(render_all(jnp.asarray(poses[:, :3, :4])))
    return images.astype(np.float32), poses, K


def make_data_dict(n_views: int = 8, H: int = 48, W: int = 48, n_test: int = 2):
    """Assemble a reference-shaped data_dict (load_everything.py:21-26)."""
    images, poses, K = sphere_scene_images(n_views + n_test, H, W)
    i_all = np.arange(n_views + n_test)
    return {
        "HW": np.array([[H, W]] * len(i_all)),
        "Ks": np.stack([K] * len(i_all)),
        "near": 1.0,
        "far": 6.0,
        "near_clip": None,
        "i_train": i_all[:n_views],
        "i_val": i_all[n_views:],
        "i_test": i_all[n_views:],
        "poses": poses,
        "render_poses": poses[n_views:],
        "images": images,
        "irregular_shape": False,
    }
