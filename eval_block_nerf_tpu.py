#!/usr/bin/env python
"""Block-NeRF composed inference CLI (the ``eval_block_nerf.py`` equivalent):
per-view candidate-block rendering, visibility gating, IDW compositing into a
video."""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Block-NeRF composed inference")
    p.add_argument("--root_dir", required=True)
    p.add_argument("--ckpt_dir", required=True, help="dir with per-block params")
    p.add_argument("--out_dir", default="compose_out")
    p.add_argument("--img_downscale", type=int, default=4)
    p.add_argument("--near", type=float, default=0.01)
    p.add_argument("--far", type=float, default=15.0)
    p.add_argument("--cam_begin", default=None)
    p.add_argument("--cam_end", default=None)
    p.add_argument("--chunk", type=int, default=4096)
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from unboundednerfpytorch_tpu.models.block_nerf import (
        compose, dataset, model as bn_model,
    )

    with open(os.path.join(args.root_dir, "train", "split_block_train.json")) as f:
        block_split = json.load(f)
    with open(os.path.join(args.root_dir, "train", "train_all_meta.json")) as f:
        meta = json.load(f)

    # load all trained block params
    block_params = {}
    centroids = {}
    for block in block_split:
        pth = os.path.join(args.ckpt_dir, block, "params.msgpack")
        if not os.path.exists(pth):
            continue
        n_app = max(e[1] for e in block_split[block]["elements"]) + 1
        template = bn_model.create(jax.random.PRNGKey(0), n_appearance=n_app)
        with open(pth, "rb") as f:
            block_params[block] = serialization.from_bytes(template, f.read())
        centroids[block] = block_split[block]["centroid"]
    assert block_params, f"no block checkpoints under {args.ckpt_dir}"

    # views to compose: all train views between cam_begin/cam_end (or all)
    names = list(meta.keys())
    if args.cam_begin and args.cam_end:
        names = names[names.index(args.cam_begin) : names.index(args.cam_end) + 1]

    os.makedirs(args.out_dir, exist_ok=True)
    import imageio.v2 as imageio

    frames = []
    for name in names:
        candidates = compose.filter_blocks(name, block_split)
        candidates = [b for b in candidates if b in block_params]
        if not candidates:
            continue
        rays, _, ts, (H, W) = dataset.build_image_rays(
            meta[name], None, 0, args.img_downscale, args.near, args.far
        )
        rgb, depth = compose.compose_view(
            block_params, candidates, centroids,
            jnp.asarray(rays), jnp.asarray(ts), H, W, chunk=args.chunk,
        )
        if rgb is None:
            continue
        imageio.imwrite(os.path.join(args.out_dir, f"{name}.png"), rgb["compose"])
        frames.append(rgb["compose"])
        print(f"{name}: composed from {list(rgb.keys())[:-1]}")
    if frames:
        from unboundednerfpytorch_tpu.render import write_video

        write_video(os.path.join(args.out_dir, "compose.mp4"),
                    np.stack(frames), fps=10)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
