"""ARF (Artistic Radiance Fields) stylizer.

Re-implements ``/root/reference/FourierGrid/arf.py``: SVD-based covariance
color matching of a rendered image set to a style image, returning the
stylized set and the 4x4 color transform. Device-side linear algebra in JAX.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp


def load_style_img(style_img_path: str, content_h: int, content_w: int) -> np.ndarray:
    """Resize the style image so its long side matches the content long side,
    then halve (arf.py:25-50)."""
    import cv2
    import imageio.v2 as imageio

    style = imageio.imread(style_img_path).astype(np.float32) / 255.0
    sh, sw = style.shape[:2]
    long_side = max(content_h, content_w)
    if sh > sw:
        style = cv2.resize(style, (int(long_side / sh * sw), long_side),
                           interpolation=cv2.INTER_AREA)
    else:
        style = cv2.resize(style, (long_side, int(long_side / sw * sh)),
                           interpolation=cv2.INTER_AREA)
    style = cv2.resize(style, (style.shape[1] // 2, style.shape[0] // 2),
                       interpolation=cv2.INTER_AREA)
    return style


def match_colors_for_image_set(image_set: np.ndarray, style_img: np.ndarray):
    """Covariance color transfer (arf.py:51-89).

    image_set [N, H, W, 3], style_img [Hs, Ws, 3] in [0,1].
    Returns (stylized set, color_tf [4,4]).
    """
    sh = image_set.shape
    x = jnp.asarray(image_set).reshape(-1, 3)
    s = jnp.asarray(style_img).reshape(-1, 3)

    mu_c = x.mean(0, keepdims=True)
    mu_s = s.mean(0, keepdims=True)
    cov_c = (x - mu_c).T @ (x - mu_c) / x.shape[0]
    cov_s = (s - mu_s).T @ (s - mu_s) / s.shape[0]

    u_c, sig_c, _ = jnp.linalg.svd(cov_c)
    u_s, sig_s, _ = jnp.linalg.svd(cov_s)

    scl_c = jnp.diag(1.0 / jnp.sqrt(jnp.clip(sig_c, 1e-8, 1e8)))
    scl_s = jnp.diag(jnp.sqrt(jnp.clip(sig_s, 1e-8, 1e8)))

    tmp_mat = u_s @ scl_s @ u_s.T @ u_c @ scl_c @ u_c.T
    tmp_vec = mu_s.reshape(1, 3) - mu_c.reshape(1, 3) @ tmp_mat.T

    out = jnp.clip(x @ tmp_mat.T + tmp_vec, 0.0, 1.0).reshape(sh)

    color_tf = jnp.eye(4)
    color_tf = color_tf.at[:3, :3].set(tmp_mat)
    color_tf = color_tf.at[:3, 3].set(tmp_vec[0])
    return np.asarray(out), np.asarray(color_tf)


class ARF:
    """Reference-compatible wrapper: style image load + stylization of a
    render set (consumed by run_render's optional stylize path)."""

    def __init__(self, style_root: str, style_id, content_h: int, content_w: int):
        path = os.path.join(style_root, f"{style_id}.jpg")
        self.np_style_img = load_style_img(path, content_h, content_w)

    def match_colors_for_image_set(self, image_set: np.ndarray, save_dir: str | None = None):
        if save_dir:
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(save_dir, "style_image.png"),
                np.clip(self.np_style_img * 255.0, 0, 255).astype(np.uint8),
            )
        return match_colors_for_image_set(image_set, self.np_style_img)
