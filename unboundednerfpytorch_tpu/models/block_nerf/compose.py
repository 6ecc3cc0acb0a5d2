"""Block-NeRF composed inference: block filtering, visibility gating,
inverse-distance-weighted merge.

Re-implements the eval pipeline of ``/root/reference/eval_block_nerf.py``:
  * :func:`filter_blocks` — blocks whose element list contains the view
    (:86-92);
  * :func:`distance_weight` — ‖origin − centroid‖^-p IDW (:95-98);
  * visibility gate: keep blocks with mean fine-visibility > 0.05 (:215-221);
  * :func:`inverse_interpolation` — normalized-weight blend of block
    RGB/depth maps (:101-133) — computed device-side.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models.block_nerf import rendering as R

VISIBILITY_GATE = 0.05  # mean fine-visibility threshold (eval_block_nerf.py:215)


def filter_blocks(image_name: str, block_split: dict) -> list[str]:
    """Blocks whose element list contains this source image."""
    out = []
    for block, info in block_split.items():
        for element in info["elements"]:
            if element[0] == image_name:
                out.append(block)
    return out


def distance_weight(origin, centroid, p: int = 4) -> float:
    return float(np.linalg.norm(np.asarray(origin) - np.asarray(centroid)) ** -p)


def render_block(params, rays, ts, chunk: int = 4096, **render_kwargs):
    """Chunked full-image render of one block (batched_inference)."""
    # checkpoints/device_get hand numpy pytrees; tracers can't index numpy
    params = jax.tree.map(jnp.asarray, params)
    n = rays.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        rays = jnp.concatenate([rays, jnp.repeat(rays[-1:], n_pad, axis=0)])
        ts = jnp.concatenate([ts, jnp.repeat(ts[-1:], n_pad, axis=0)])

    fwd = jax.jit(
        lambda r, t: R.render_rays(params, r, t, key=None, **render_kwargs)
    )
    outs = {"rgb_fine": [], "depth_fine": [], "transmittance_fine_vis": []}
    for i in range(0, rays.shape[0], chunk):
        res = fwd(rays[i : i + chunk], ts[i : i + chunk])
        outs["rgb_fine"].append(np.asarray(res["rgb_fine"]))
        outs["depth_fine"].append(np.asarray(res["depth_fine"]))
        outs["transmittance_fine_vis"].append(
            np.asarray(res["transmittance_fine_vis"]).mean(-1)
        )
    return {k: np.concatenate(v)[:n] for k, v in outs.items()}


def inverse_interpolation(block_results: dict, H: int, W: int):
    """IDW-blend per-block renders into the composed frame.

    block_results: {block: {"rgb_fine": [HW,3], "depth_fine": [HW],
    "distance_weight": float}}. Returns (rgb dict, depth dict) with a
    'compose' entry, mirroring Inverse_Interpolation (:101-133)."""
    weights = []
    img_rgb, img_depth = {}, {}
    for block, res in block_results.items():
        rgb = np.clip(res["rgb_fine"].reshape(H, W, 3), 0, 1)
        img_rgb[block] = (rgb * 255).astype(np.uint8)
        depth = np.nan_to_num(res["depth_fine"].reshape(H, W))
        mi, ma = depth.min(), depth.max()
        img_depth[block] = (255 * (depth - mi) / max(ma - mi, 1e-8)).astype(np.uint8)
        weights.append(res["distance_weight"])
    total = sum(weights)
    weights = [w / total for w in weights]
    img_rgb["compose"] = sum(
        w * rgb for w, rgb in zip(weights, list(img_rgb.values()))
    ).astype(np.uint8)
    img_depth["compose"] = sum(
        w * d for w, d in zip(weights, list(img_depth.values()))
    ).astype(np.uint8)
    return img_rgb, img_depth


def compose_view(
    block_params: dict,
    candidate_blocks: list[str],
    block_centroids: dict,
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    H: int,
    W: int,
    p: int = 4,
    chunk: int = 4096,
    **render_kwargs,
):
    """Full composed inference for one camera view (eval_block_nerf.py:188-259):
    render candidate blocks, gate on mean visibility, IDW-merge."""
    origin = np.asarray(rays[0, :3])
    results = {}
    for block in candidate_blocks:
        res = render_block(block_params[block], rays, ts, chunk=chunk, **render_kwargs)
        if float(res["transmittance_fine_vis"].mean()) <= VISIBILITY_GATE:
            continue  # visibility gate
        res["distance_weight"] = distance_weight(origin, block_centroids[block], p=p)
        results[block] = res
    if not results:
        return None, None
    return inverse_interpolation(results, H, W)
