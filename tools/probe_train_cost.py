"""Probe: component costs of the training-step gather engine at the
flagship shape (160^3, 7 banks, 13 fused channels, bf16 grids, 2048 rays x
96 budget samples) — the inputs to the two-stage-training design (VERDICT
r3 next-round #3).

Phases (each chained through donated state so the relay cannot memoize):
  pack_fwd        materialize all 7 fused packed tables (+ tiny gather)
  gather_fwd      7 x 196k wide-row gathers from pre-packed tables
  gather_fwdbwd   same + scatter backward into the tables
  pg_fwdbwd       pack+gather fwd+bwd THROUGH the pack (adds unpack reduce)
  narrow_fwd      7 x 196k folded 1-ch (density) gathers, forward only
  survivors_*     wide fwd+bwd at the color_budget row count (2048 x 32)

Run serially with nothing else on the TPU:
  python tools/probe_train_cost.py [--dim 160] [--rays 2048]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import packed as P

B = 7
CF = 13  # 1 density + 12 k0


def timeit(fn, args, iters=8, warmup=2):
    args = jax.tree.map(jnp.asarray, args)
    for _ in range(warmup):
        args = fn(*args)
        jax.block_until_ready(args)
    t0 = time.time()
    for _ in range(iters):
        args = fn(*args)
    jax.block_until_ready(args)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=160)
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--cb", type=int, default=32)
    args = ap.parse_args()
    D, N, S, CB = args.dim, args.rays, args.samples, args.cb
    dims = (D, D, D)
    T = (D + 1) ** 3
    key = jax.random.PRNGKey(0)
    grids = jax.random.normal(key, (B, D, D, D, CF), jnp.bfloat16) * 0.01
    dgrids = grids[..., :1]
    idx = jax.random.randint(key, (B, N, S), 0, T)
    idx_cb = idx[:, :, :CB]
    w = jax.random.uniform(key, (B, N, S, 8), jnp.float32)
    w_cb = w[:, :, :CB]
    rows = N * S * B

    print(f"dim={D} banks={B} cf={CF} rays={N} samples={S} cb={CB} "
          f"table_rows={T}")

    import numpy as np
    grids_np = np.asarray(grids)
    del grids, dgrids

    def fresh():
        return jnp.asarray(grids_np)

    def fresh_d():
        return jnp.asarray(grids_np[..., :1])

    # --- gather from PRE-packed tables --------------------------------------
    tables = jax.jit(
        lambda g: jnp.stack([P.pack_corners(g[b]) for b in range(B)])
    )(fresh())

    def gather_fwd(tb, acc):
        out = acc
        for b in range(B):
            v = P.packed_trilerp(tb[b], idx[b], w[b], CF)
            out = out + v.astype(jnp.float32).mean()
        return tb + 0.0 * out.astype(tb.dtype), acc * 0 + out

    t = timeit(jax.jit(gather_fwd, donate_argnums=(0, 1)),
               (tables, jnp.zeros(())))
    print(f"gather_fwd  ({rows/1e6:.2f}M wide rows):  {t*1e3:8.2f} ms "
          f"({rows/t/1e6:.0f}M rows/s)")

    def gather_fwdbwd(tb, acc):
        def loss(tb_):
            out = 0.0
            for b in range(B):
                v = P.packed_trilerp(tb_[b], idx[b], w[b], CF)
                out = out + v.astype(jnp.float32).mean()
            return out

        l, g = jax.value_and_grad(loss)(tb)
        return tb - 1e-6 * g.astype(tb.dtype), acc * 0 + l

    t = timeit(jax.jit(gather_fwdbwd, donate_argnums=(0, 1)),
               (tables, jnp.zeros(())))
    print(f"gather_fwdbwd (+wide scatter):    {t*1e3:8.2f} ms")
    del tables

    # --- pack+gather through the pack (the current training path) ----------
    def pg_fwdbwd(g, acc):
        def loss(g_):
            out = 0.0
            for b in range(B):
                tb = P.pack_corners(g_[b])
                v = P.packed_trilerp(tb, idx[b], w[b], CF)
                out = out + v.astype(jnp.float32).mean()
            return out

        l, gr = jax.value_and_grad(loss)(g)
        return g - 1e-6 * gr.astype(g.dtype), acc * 0 + l

    t = timeit(jax.jit(pg_fwdbwd, donate_argnums=(0, 1)),
               (fresh(), jnp.zeros(())))
    print(f"pack+gather fwd+bwd (CURRENT):    {t*1e3:8.2f} ms")

    # --- narrow density-only, forward only (stage-A candidate) -------------
    fold = 16

    def narrow_fwd(g, acc):
        out = acc
        for b in range(B):
            tb = P.pack_corners_folded(g[b], fold)
            v = P.packed_trilerp_folded(tb, idx[b], w[b], 1, fold)
            out = out + v.astype(jnp.float32).mean()
        return g + 0.0 * out.astype(g.dtype), acc * 0 + out

    t = timeit(jax.jit(narrow_fwd, donate_argnums=(0, 1)),
               (fresh_d(), jnp.zeros(())))
    print(f"narrow density pack+fwd (stageA): {t*1e3:8.2f} ms")

    # --- survivor-count fused fwd+bwd through pack (stage-B candidate) -----
    def pg_cb_fwdbwd(g, acc):
        def loss(g_):
            out = 0.0
            for b in range(B):
                tb = P.pack_corners(g_[b])
                v = P.packed_trilerp(tb, idx_cb[b], w_cb[b], CF)
                out = out + v.astype(jnp.float32).mean()
            return out

        l, gr = jax.value_and_grad(loss)(g)
        return g - 1e-6 * gr.astype(g.dtype), acc * 0 + l

    t = timeit(jax.jit(pg_cb_fwdbwd, donate_argnums=(0, 1)),
               (fresh(), jnp.zeros(())))
    print(f"pack+gather fwd+bwd @cb rows:     {t*1e3:8.2f} ms")

    # --- direct 8-corner scatter backward (no pack), survivors ------------
    def direct_cb_fwdbwd(g, acc):
        def loss(g_):
            out = 0.0
            for b in range(B):
                flat = g_[b].reshape(-1, CF)
                # 8 narrow gathers + manual trilerp (backward = 8 narrow
                # scatters into the UNPACKED grid; no pack, no unpack)
                v = 0.0
                for k in range(8):
                    v = v + (
                        jnp.take(flat, idx_cb[b] % (D**3), axis=0)
                        .astype(jnp.float32) * w_cb[b][..., k : k + 1]
                    )
                out = out + v.mean()
            return out

        l, gr = jax.value_and_grad(loss)(g)
        return g - 1e-6 * gr.astype(g.dtype), acc * 0 + l

    t = timeit(jax.jit(direct_cb_fwdbwd, donate_argnums=(0, 1)),
               (fresh(), jnp.zeros(())))
    print(f"8-corner direct fwd+bwd @cb rows: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
