"""Probe: gather issue rate from a packed table as a jit ARGUMENT vs as a
compile-time CONSTANT, at the render-table shape (the round-2 constant-baked
mode measured 1.5-2x; this isolates whether the win is the constant gather
itself — the input to the sharded-constant-compile design for the exact
render path, VERDICT r3 #2/#6).

Run serially: python tools/probe_const_gather.py [--dim 160] [--ch 96]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=6, warmup=2):
    for i in range(warmup):
        jax.block_until_ready(fn(*args, jax.random.PRNGKey(1000 + i)))
    t0 = time.time()
    for i in range(iters):
        out = fn(*args, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=160)
    ap.add_argument("--ch", type=int, default=96)  # 8*12 k0 lanes
    ap.add_argument("--rows", type=int, default=1 << 21)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    T = (args.dim + 1) ** 3
    dt = jnp.dtype(args.dtype)
    n = args.rows

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, args.ch), dt)

    def body(t, k):
        idx = jax.random.randint(k, (n,), 0, T)
        return jnp.take(t, idx, axis=0).astype(jnp.float32).sum()

    t_arg = timeit(jax.jit(body), table)
    print(f"arg table   [{T}x{args.ch} {args.dtype}]: "
          f"{n/t_arg/1e6:7.1f}M rows/s ({t_arg*1e3:.1f} ms)")

    import numpy as np

    table_np = np.asarray(table)

    @jax.jit
    def body_const(k):
        t = jnp.asarray(table_np)  # baked into the executable as a constant
        idx = jax.random.randint(k, (n,), 0, T)
        return jnp.take(t, idx, axis=0).astype(jnp.float32).sum()

    t0 = time.time()
    jax.block_until_ready(body_const(jax.random.PRNGKey(999)))
    print(f"const compile: {time.time()-t0:.1f}s")
    t_const = timeit(body_const)
    print(f"const table [{T}x{args.ch} {args.dtype}]: "
          f"{n/t_const/1e6:7.1f}M rows/s ({t_const*1e3:.1f} ms)  "
          f"({t_arg/t_const:.2f}x vs arg)")


if __name__ == "__main__":
    main()
