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


# ---------------------------------------------------------------------------
# unbounded scene (full-recipe convergence gate)
# ---------------------------------------------------------------------------


def _scene_density_color(pts: jnp.ndarray, shell_radius: float):
    """Analytic density/color field of the unbounded test scene: textured
    inner geometry (sphere cluster + ground slab, multi-frequency sinusoid
    textures) plus a far emissive background shell — the scene shape the
    contracted-coordinate recipe is built for (inner linspace covers the
    cluster, the 1/s outer samples cover the shell)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]

    # inner cluster: four textured spheres
    spheres = (
        ((0.45, 0.0, -0.1), 0.38),
        ((-0.4, 0.35, 0.05), 0.30),
        ((-0.15, -0.5, -0.2), 0.26),
        ((0.05, 0.15, 0.42), 0.22),
    )
    density = jnp.zeros(pts.shape[:-1], pts.dtype)
    color = jnp.zeros(pts.shape, pts.dtype)
    weight_acc = jnp.zeros(pts.shape[:-1], pts.dtype)
    base_colors = (
        (0.9, 0.35, 0.25), (0.25, 0.7, 0.9), (0.4, 0.85, 0.3), (0.9, 0.8, 0.2)
    )
    tex_freqs = (7.0, 9.0, 11.0, 13.0)
    for (c, r), bc, f in zip(spheres, base_colors, tex_freqs):
        d2 = jnp.sum((pts - jnp.asarray(c)) ** 2, -1)
        inside = (d2 < r * r).astype(pts.dtype)
        density = density + inside * 60.0
        tex = 0.5 + 0.5 * jnp.sin(f * x) * jnp.sin(f * 1.31 * y + 0.7) * jnp.sin(
            f * 0.77 * z + 1.9
        )
        col = jnp.asarray(bc) * (0.35 + 0.65 * tex[..., None])
        color = color + inside[..., None] * col
        weight_acc = weight_acc + inside

    # ground slab with a checker-ish sinusoid texture
    slab = ((z > -0.62) & (z < -0.5) & (jnp.abs(x) < 1.1) & (jnp.abs(y) < 1.1))
    slab_f = slab.astype(pts.dtype)
    density = density + slab_f * 60.0
    check = 0.5 + 0.5 * jnp.sin(10.0 * x) * jnp.sin(10.0 * y)
    slab_col = jnp.stack([0.25 + 0.5 * check, 0.25 + 0.3 * check,
                          0.35 + 0.2 * check], -1)
    color = color + slab_f[..., None] * slab_col
    weight_acc = weight_acc + slab_f

    # far background: thick emissive shell, smooth direction texture
    rad = jnp.linalg.norm(pts, axis=-1)
    shell = (rad > shell_radius).astype(pts.dtype)
    density = density + shell * 60.0
    u = pts / jnp.maximum(rad[..., None], 1e-6)
    sky = jnp.stack([
        0.55 + 0.35 * jnp.sin(2.0 * u[..., 0] + 3.0 * u[..., 2]),
        0.55 + 0.35 * jnp.sin(2.5 * u[..., 1] - 1.3),
        0.6 + 0.3 * jnp.cos(3.0 * u[..., 0] * u[..., 1] + 0.4),
    ], -1)
    color = color + shell[..., None] * jnp.clip(sky, 0.0, 1.0)
    weight_acc = weight_acc + shell

    color = color / jnp.maximum(weight_acc[..., None], 1.0)
    return density, jnp.clip(color, 0.0, 1.0)


def unbounded_scene_images(
    n_views: int = 15,
    H: int = 64,
    W: int = 64,
    shell_radius: float = 12.0,
    n_steps: int = 768,
    bg: float = 1.0,
):
    """Ground-truth renders of the unbounded test scene by dense analytic
    volume integration out past the background shell. Cameras orbit the
    inner cluster at alternating elevations (the 360-capture pattern of the
    Mip-NeRF-360 scenes the recipe targets)."""
    poses = []
    for k in range(n_views):
        theta = 2 * np.pi * k / n_views
        elev = 0.35 if k % 2 == 0 else 0.65
        pos = np.array([
            3.0 * np.cos(theta) * np.cos(elev),
            3.0 * np.sin(theta) * np.cos(elev),
            3.0 * np.sin(elev),
        ])
        poses.append(look_at_pose(pos, np.zeros(3)))
    poses = np.stack(poses).astype(np.float32)
    focal = 0.9 * W
    K = np.array(
        [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], dtype=np.float32
    )

    t = jnp.linspace(0.05, shell_radius + 2.0, n_steps)
    dt = t[1] - t[0]

    def render_view(c2w):
        ro, rd, _ = ray_ops.get_rays_of_a_view(H, W, jnp.asarray(K), c2w)
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)

        def chunk(c):
            co, cd = c
            pts = co[:, None, :] + cd[:, None, :] * t[None, :, None]
            density, color = _scene_density_color(pts, shell_radius)
            alpha = 1.0 - jnp.exp(
                -density * dt * jnp.linalg.norm(cd, axis=-1)[:, None]
            )
            t_excl = jnp.cumprod(1 - alpha + 1e-10, -1) / (1 - alpha + 1e-10)
            w = t_excl * alpha
            rgb = jnp.einsum("ns,nsc->nc", w, color)
            return rgb + (1 - w.sum(-1))[:, None] * bg

        n = ro.shape[0]
        c = next(c for c in range(min(1024, n), 0, -1) if n % c == 0)
        return jax.lax.map(
            chunk, (ro.reshape(n // c, c, 3), rd.reshape(n // c, c, 3))
        ).reshape(H, W, 3)

    render = jax.jit(render_view)
    images = np.stack([np.asarray(render(p[:3, :4])) for p in poses])
    return images.astype(np.float32), poses, K


def make_unbounded_data_dict(
    n_train: int = 12, n_test: int = 3, H: int = 64, W: int = 64
):
    """Reference-shaped data_dict for the unbounded scene: train/test split,
    near_clip set (exercises weight_nearclip), llff-unbounded conventions."""
    n = n_train + n_test
    images, poses, K = unbounded_scene_images(n, H, W)
    i_all = np.arange(n)
    # held-out views interleaved like llffhold
    i_test = i_all[:: max(n // max(n_test, 1), 1)][:n_test]
    i_train = np.setdiff1d(i_all, i_test)
    return {
        "HW": np.array([[H, W]] * n),
        "Ks": np.stack([K] * n),
        "near": 0.2,
        "far": 1e9,
        "near_clip": 0.3,
        "i_train": i_train,
        "i_val": i_test,
        "i_test": i_test,
        "poses": poses,
        "render_poses": poses[i_test],
        "images": images,
        "irregular_shape": False,
    }


# ---------------------------------------------------------------------------
# street scene (Block-NeRF end-to-end gate)
# ---------------------------------------------------------------------------


def _street_density_color(pts: jnp.ndarray):
    """Analytic density/color of the synthetic street: textured building
    boxes on both sides, a ground slab, all along the x axis — the
    city-block capture pattern Block-NeRF targets (cameras drive down the
    street, scene split into overlapping blocks by camera position)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    density = jnp.zeros(pts.shape[:-1], pts.dtype)
    color = jnp.zeros(pts.shape, pts.dtype)
    wsum = jnp.zeros(pts.shape[:-1], pts.dtype)

    # buildings: boxes centered every 2.4 x-units on both sides
    centers = (-3.6, -1.2, 1.2, 3.6)
    palettes = (
        (0.85, 0.4, 0.3), (0.35, 0.6, 0.85), (0.5, 0.8, 0.4), (0.85, 0.75, 0.35)
    )
    for side in (-1.0, 1.0):
        for cx, base in zip(centers, palettes):
            inside = (
                (jnp.abs(x - cx) < 0.7)
                & (jnp.abs(y - side * 1.8) < 0.5)
                & (z > -0.5) & (z < 1.0 + 0.3 * jnp.sin(3.0 * cx))
            )
            f = inside.astype(pts.dtype)
            density = density + f * 50.0
            tex = 0.5 + 0.5 * jnp.sin(9.0 * x + 2.0 * side) * jnp.sin(
                7.0 * z + 1.0
            )
            col = jnp.asarray(base) * (0.4 + 0.6 * tex[..., None])
            color = color + f[..., None] * col
            wsum = wsum + f

    ground = (z > -0.62) & (z < -0.5)
    gf = ground.astype(pts.dtype)
    density = density + gf * 50.0
    check = 0.5 + 0.5 * jnp.sin(6.0 * x) * jnp.sin(6.0 * y)
    color = color + gf[..., None] * jnp.stack(
        [0.3 + 0.3 * check, 0.3 + 0.3 * check, 0.32 + 0.2 * check], -1
    )
    wsum = wsum + gf
    color = color / jnp.maximum(wsum[..., None], 1.0)
    return density, jnp.clip(color, 0.0, 1.0)


def make_street_scene(
    n_views: int = 16,
    H: int = 40,
    W: int = 56,
    near: float = 0.05,
    far: float = 14.0,
    n_steps: int = 448,
):
    """Synthetic street capture for the Block-NeRF e2e gate.

    Cameras drive down the street (x in [-3.2, 3.2], alternating slight
    yaw), each with its own ``equivalent_exposure`` scaling the GT image
    (exercises the exposure conditioning). Returns
    (views, images) where ``views[i]`` is a reference-shaped img_info dict
    (c2w/intrinsics/W/H/equivalent_exposure/image_name — the
    models/block_nerf/dataset.py metadata contract) and images[i] the
    [H, W, 3] GT, both rendered along the EXACT rays the dataset layer
    generates (dataset.get_ray_directions conventions)."""
    from unboundednerfpytorch_tpu.models.block_nerf import dataset as D

    focal = 0.8 * W
    sky = jnp.asarray([0.65, 0.75, 0.9])
    t = jnp.linspace(near, far, n_steps)
    dt = t[1] - t[0]

    @jax.jit
    def render_rays_gt(ro, rd):
        pts = ro[:, None, :] + rd[:, None, :] * t[None, :, None]
        density, color = _street_density_color(pts)
        alpha = 1.0 - jnp.exp(-density * dt)
        t_excl = jnp.cumprod(1 - alpha + 1e-10, -1) / (1 - alpha + 1e-10)
        w = t_excl * alpha
        rgb = jnp.einsum("ns,nsc->nc", w, color)
        return rgb + (1 - w.sum(-1))[:, None] * sky

    views, images = [], []
    for i in range(n_views):
        xcam = -3.2 + 6.4 * i / max(n_views - 1, 1)
        cam = np.array([xcam, 0.0, 0.55])
        yaw = 0.55 if i % 2 == 0 else -0.55
        target = np.array([xcam + 2.2, yaw * 2.0, 0.25])
        c2w = look_at_pose(cam, target)
        exposure = 0.85 + 0.3 * (i % 4) / 3.0
        info = {
            "c2w": c2w[:3].tolist(),
            "intrinsics": [focal, focal],
            "W": W,
            "H": H,
            "equivalent_exposure": exposure,
            "image_name": f"street_{i:03d}",
        }
        dirs = D.get_ray_directions(H, W, np.array(
            [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32
        ))
        ro, rd = D.get_rays(dirs, np.asarray(c2w[:3], np.float32))
        rgb = np.asarray(render_rays_gt(jnp.asarray(ro), jnp.asarray(rd)))
        img = np.clip(rgb.reshape(H, W, 3) * exposure, 0.0, 1.0)
        views.append(info)
        images.append(img.astype(np.float32))
    return views, images


def split_street_blocks(views, overlap: float = 1.2):
    """Partition street views into two overlapping blocks by camera x
    (split_block.py semantics at toy scale): returns a block_split dict
    {block: {"centroid": [x,y,z], "elements": [(image_name, appearance_id)]}}
    with GLOBAL appearance ids (one shared table across blocks)."""
    xs = np.array([np.asarray(v["c2w"])[0, 3] for v in views])
    mid = float(np.median(xs))
    if len(xs) > 1:
        spacing = float(np.max(np.diff(np.sort(xs))))
        overlap = max(overlap, 2.1 * spacing)  # ≥2 views in the overlap
    split = {}
    for name, keep in (
        ("block_0", xs <= mid + overlap / 2),
        ("block_1", xs >= mid - overlap / 2),
    ):
        ids = np.nonzero(keep)[0]
        split[name] = {
            "centroid": np.mean(
                [np.asarray(views[i]["c2w"])[:3, 3] for i in ids], axis=0
            ).tolist(),
            "elements": [(views[i]["image_name"], int(i)) for i in ids],
        }
    return split


def write_fake_360_scene(basedir: str, n_views: int = 12, H: int = 32,
                         W: int = 32, factor: int = 8):
    """Materialize the unbounded test scene in the EXACT on-disk layout of a
    Mip-NeRF-360 / LLFF capture (the `data/360_v2/garden` layout
    tools/parity_run.py --real consumes): ``poses_bounds.npy`` in the LLFF
    storage convention (columns [-up, right, back], hwf at full resolution)
    plus ``images/`` (full-size) and pre-minified ``images_{factor}/``
    holding the rendered views — so the real fetch→load→train entry runs
    unmodified, with no ImageMagick/cv2 minification step.

    The stored convention is the inverse of data/llff.py's load transform
    (load_llff.py: loaded_col0 = stored_col1, loaded_col1 = -stored_col0),
    so the loader reconstructs exactly the poses the images were rendered
    from; the loader's bd_factor/recenter/spherify transforms are gauge
    (rigid+scale) changes that keep (pose, image) pairs self-consistent."""
    import os

    import imageio.v2 as imageio

    images, poses, K = unbounded_scene_images(n_views, H, W)
    os.makedirs(os.path.join(basedir, "images"), exist_ok=True)
    os.makedirs(os.path.join(basedir, f"images_{factor}"), exist_ok=True)

    rows = []
    focal_full = float(K[0, 0]) * factor
    for i in range(n_views):
        img8 = (np.clip(images[i], 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(
            os.path.join(basedir, f"images_{factor}", f"img_{i:03d}.png"), img8
        )
        # full-size: nearest-upsampled copy (content-consistent; only the
        # minified dir is ever read on the factor path)
        imageio.imwrite(
            os.path.join(basedir, "images", f"img_{i:03d}.png"),
            np.repeat(np.repeat(img8, factor, 0), factor, 1),
        )
        c2w = poses[i][:3]  # [3,4], columns [right, up, back, t]
        stored = np.concatenate(
            [
                -c2w[:, 1:2],  # stored col0 = -up
                c2w[:, 0:1],  # stored col1 = right
                c2w[:, 2:3],
                c2w[:, 3:4],
                np.array(
                    [[H * factor], [W * factor], [focal_full]], np.float64
                ),
            ],
            axis=1,
        )  # [3,5]
        rows.append(np.concatenate([stored.reshape(-1), [0.4, 16.0]]))
    np.save(os.path.join(basedir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    return basedir
