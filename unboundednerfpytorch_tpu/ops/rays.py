"""Camera-ray generation.

Semantics mirror the reference helpers ``get_rays`` / ``ndc_rays`` /
``get_rays_of_a_view`` (``/root/reference/FourierGrid/dvgo.py:493-559``),
including the ``inverse_y`` / ``flip_x`` / ``flip_y`` intrinsic modes and the
'lefttop' / 'center' / 'random' pixel-center conventions — but vectorized as
pure JAX functions over whole images (and vmappable over poses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_rays(
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    inverse_y: bool = False,
    flip_x: bool = False,
    flip_y: bool = False,
    mode: str = "center",
    key: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate rays for one view.

    Args:
      H, W: image size. K: [3,3] intrinsics. c2w: [3,4] or [4,4] camera-to-world.
      inverse_y: +y/+z camera convention (blendedmvs/nsvf/tankstemple style).
      flip_x, flip_y: mirror pixel axes (co3d style).
      mode: 'lefttop' | 'center' | 'random' pixel sample position.
      key: PRNG key, required for mode='random'.

    Returns:
      rays_o, rays_d: each [H, W, 3] in world space.
    """
    i = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    j = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    if mode == "lefttop":
        pass
    elif mode == "center":
        i = i + 0.5
        j = j + 0.5
    elif mode == "random":
        if key is None:
            raise ValueError("mode='random' requires a PRNG key")
        ki, kj = jax.random.split(key)
        i = i + jax.random.uniform(ki, i.shape)
        j = j + jax.random.uniform(kj, j.shape)
    else:
        raise NotImplementedError(f"unknown ray mode {mode!r}")

    if flip_x:
        i = i[:, ::-1]
    if flip_y:
        j = j[::-1, :]

    if inverse_y:
        dirs = jnp.stack(
            [(i - K[0][2]) / K[0][0], (j - K[1][2]) / K[1][1], jnp.ones_like(i)], -1
        )
    else:
        dirs = jnp.stack(
            [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -jnp.ones_like(i)], -1
        )
    # Rotate camera-frame directions into the world frame.
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(
    H: int,
    W: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and project into NDC (forward-facing LLFF)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def get_rays_of_a_view(
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    ndc: bool = False,
    inverse_y: bool = False,
    flip_x: bool = False,
    flip_y: bool = False,
    mode: str = "center",
    key: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rays plus unit view directions for one view; optionally NDC-projected."""
    rays_o, rays_d = get_rays(
        H, W, K, c2w, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
        mode=mode, key=key,
    )
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if ndc:
        rays_o, rays_d = ndc_rays(H, W, K[0][0], 1.0, rays_o, rays_d)
    return rays_o, rays_d, viewdirs


def get_training_rays_flatten(
    images: jnp.ndarray,
    poses: jnp.ndarray,
    H: int,
    W: int,
    K: jnp.ndarray,
    ndc: bool = False,
    inverse_y: bool = False,
    flip_x: bool = False,
    flip_y: bool = False,
):
    """Precompute the full flattened ray store for training.

    Vectorized equivalent of ``get_training_rays_flatten``
    (reference ``dvgo.py:595-627``) for same-shape images: vmap ray generation
    over all poses at once instead of a Python loop.

    K may be one shared [3, 3] intrinsic matrix or per-view [N, 3, 3]
    (multi-camera rigs — e.g. Waymo with sample_cam=None — carry different
    fx/fy/cx/cy per view; the reference passes Ks[i_train] per view).

    Returns rgb [N,3], rays_o [N,3], rays_d [N,3], viewdirs [N,3],
    img_index [N] (per-ray source image id, used by appearance embeddings).
    """
    n_img = poses.shape[0]
    Kb = jnp.broadcast_to(K, (n_img, 3, 3)) if K.ndim == 2 else K

    def one(c2w, Ki):
        return get_rays_of_a_view(
            H, W, Ki, c2w, ndc=ndc, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y
        )

    rays_o, rays_d, viewdirs = jax.vmap(one)(poses[:, :3, :4], Kb)
    rgb = images.reshape(-1, 3)
    img_index = jnp.repeat(jnp.arange(n_img, dtype=jnp.int32), H * W)
    return (
        rgb,
        rays_o.reshape(-1, 3),
        rays_d.reshape(-1, 3),
        viewdirs.reshape(-1, 3),
        img_index,
    )
