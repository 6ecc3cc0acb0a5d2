#!/usr/bin/env python
"""Block-NeRF training CLI (the ``train_block_nerf.py`` equivalent).

One invocation trains one block (embarrassingly parallel across blocks /
hosts, reference train_block_nerf.py:24,103); data-parallel across local
chips via the jax.sharding mesh (the Lightning-DDP replacement).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Block-NeRF per-block training")
    p.add_argument("--root_dir", required=True, help="preprocessed waymo root")
    p.add_argument("--block_index", default="block_0")
    p.add_argument("--exp_name", default="block_nerf")
    p.add_argument("--img_downscale", type=int, default=4)
    p.add_argument("--near", type=float, default=0.01)
    p.add_argument("--far", type=float, default=15.0)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--steps", type=int, default=0,
                   help="override total steps (0 = one epoch over rays)")
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--n_samples", type=int, default=64)
    p.add_argument("--n_importance", type=int, default=64)
    p.add_argument("--use_disp", type=lambda s: s.lower() not in ("0", "false"),
                   default=True,
                   help="log-linear depth sampling (reference default True, "
                        "train_block_nerf.py:53)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="devices for the data mesh (0 = all)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unboundednerfpytorch_tpu.models.block_nerf import dataset, training
    from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

    # multi-host rendezvous (DDP replacement, train_block_nerf.py:127-128)
    mesh_mod.maybe_initialize_distributed(log_fn=print)

    store_np, n_images = dataset.load_block_ray_store(
        args.root_dir, block=args.block_index, img_downscale=args.img_downscale,
        near=args.near, far=args.far,
    )
    store = {k: jnp.asarray(v) for k, v in store_np.items()}
    n_rays = store["rgbs"].shape[0]
    steps = args.steps or max(1, args.num_epochs * n_rays // args.batch_size)
    print(f"{args.block_index}: {n_images} images, {n_rays} rays, {steps} steps")

    n_dev = args.data_parallel or len(jax.devices())
    mesh = mesh_mod.make_mesh(n_dev) if n_dev > 1 else None

    state = training.create_state(
        jax.random.PRNGKey(0), n_appearance=max(
            int(np.asarray(store_np["ts"]).max()) + 1, 1
        ), lr=args.lr,
    )
    state, metrics = training.train_block(
        state, store, steps, batch_size=args.batch_size, mesh=mesh,
        use_disp=args.use_disp, n_samples=args.n_samples,
        n_importance=args.n_importance,
    )

    out = os.path.join("logs", args.exp_name, f"{args.block_index}")
    os.makedirs(out, exist_ok=True)
    import json

    from flax import serialization

    with open(os.path.join(out, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, state.params)))
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"block": args.block_index, "steps": steps,
                   "psnr": float(metrics["psnr"])}, f)
    print(f"saved {out} (psnr {float(metrics['psnr']):.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
