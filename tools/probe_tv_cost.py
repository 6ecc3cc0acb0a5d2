"""Probe: cost of the TV gradient injection at the flagship shape.

The round-3 train-step ablation measured TV injection at ~107 ms/step
(426 - 319). This probe times the TV expression alone at the flagship
shapes (density [7,160,160,160,1] + k0 [7,160,160,160,12], bf16) and
compares formulations:
  a) current ops/tv.py expression (take+pad)
  b) slice-based with f32 accumulation
  c) conv-free "roll" formulation
Run: python tools/probe_tv_cost.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import tv as tv_ops


def timeit(fn, p, g, iters=16):
    """Time fn by chaining it inside ONE jitted fori_loop (the axon relay
    memoizes identical dispatches and pipelines async ones; an in-program
    loop over chained state is the only trustworthy measurement). Cost is
    (t[iters] - t[1]) / (iters - 1)."""

    def run(k):
        def f_impl(p_, g_):
            body = lambda _, gg: fn(p_, gg).astype(g.dtype)
            return jax.lax.fori_loop(0, k, body, g_)

        f = jax.jit(f_impl, donate_argnums=(1,))
        out = f(p, g + 0)  # fresh copy: g itself must survive donation
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(p, out)
        jax.block_until_ready(out)
        # fetch one element to force real completion through the relay
        float(out.reshape(-1)[0])
        return time.perf_counter() - t0

    k_lo, k_hi = 2, iters
    t_lo = min(run(k_lo) for _ in range(3))
    t_hi = min(run(k_hi) for _ in range(3))
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    key = jax.random.PRNGKey(0)
    shapes = {
        "density": (7, 160, 160, 160, 1),
        "k0": (7, 160, 160, 160, 12),
    }
    for name, shape in shapes.items():
        p = jax.random.normal(key, shape, jnp.bfloat16)
        g = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)

        cur = jax.jit(
            lambda p, g: tv_ops.total_variation_add_grad(
                p, g, 1e-6, 1e-6, 1e-6, dense_mode=True
            )
        )
        t = timeit(cur, p, g)
        gb = (p.size * p.dtype.itemsize * 3) / 1e9
        print(f"{name} {shape}: current dense {t*1e3:8.2f} ms "
              f"({gb/t:6.1f} GB/s effective of {gb:.2f} GB min traffic)")

        cur_sparse = jax.jit(
            lambda p, g: tv_ops.total_variation_add_grad(
                p, g, 1e-6, 1e-6, 1e-6, dense_mode=False
            )
        )
        t = timeit(cur_sparse, p, g)
        print(f"{name} {shape}: current sparse {t*1e3:7.2f} ms")

        # b) single-pass neighbor formulation: grad_tv[i] = sum_axis
        #    clamp(p[i]-p[i+1]) + clamp(p[i]-p[i-1]) via padded shifts in f32
        def alt(p, g):
            pf = p.astype(jnp.float32)
            acc = jnp.zeros_like(pf)
            for ax, w in ((1, 1e-6), (2, 1e-6), (3, 1e-6)):
                n = p.shape[ax]
                lo = jax.lax.slice_in_dim(pf, 0, n - 1, axis=ax)
                hi = jax.lax.slice_in_dim(pf, 1, n, axis=ax)
                d = jnp.clip(lo - hi, -1.0, 1.0) * (w / 6.0)
                pad_lo = [(0, 0)] * p.ndim
                pad_lo[ax] = (0, 1)
                pad_hi = [(0, 0)] * p.ndim
                pad_hi[ax] = (1, 0)
                acc = acc + jnp.pad(d, pad_lo) - jnp.pad(d, pad_hi)
            return (g.astype(jnp.float32) + acc).astype(g.dtype)

        t = timeit(jax.jit(alt), p, g)
        print(f"{name} {shape}: alt f32     {t*1e3:8.2f} ms")

        # c) pure axpy: the achievable-bandwidth baseline for this shape
        t = timeit(jax.jit(lambda p, g: g + p * jnp.bfloat16(1e-6)), p, g)
        print(f"{name} {shape}: axpy        {t*1e3:8.2f} ms "
              f"({gb/t:6.1f} GB/s)")

        # d) neighbor formulation: grad[i] += w/6 * sum_ax
        #    [clamp(p[i]-p[i+1])·(i+1 valid) + clamp(p[i]-p[i-1])·(i-1 valid)]
        #    one fused elementwise expression over shifted slices, no gathers
        def nbr(p, g):
            pf = p.astype(jnp.float32)
            acc = g.astype(jnp.float32)
            for ax in (1, 2, 3):
                n = p.shape[ax]
                w = jnp.float32(1e-6 / 6.0)
                pad_hi = [(0, 0)] * p.ndim
                pad_hi[ax] = (0, 1)
                pad_lo = [(0, 0)] * p.ndim
                pad_lo[ax] = (1, 0)
                nxt = jnp.pad(jax.lax.slice_in_dim(pf, 1, n, axis=ax), pad_hi)
                prv = jnp.pad(jax.lax.slice_in_dim(pf, 0, n - 1, axis=ax),
                              pad_lo)
                iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, ax)
                d_f = jnp.clip(pf - nxt, -1.0, 1.0)
                d_b = jnp.clip(pf - prv, -1.0, 1.0)
                acc = acc + w * (jnp.where(iota < n - 1, d_f, 0.0)
                                 + jnp.where(iota > 0, d_b, 0.0))
            return acc.astype(g.dtype)

        t = timeit(jax.jit(nbr), p, g)
        print(f"{name} {shape}: neighbor    {t*1e3:8.2f} ms")

        # e) same but computed on a [7,160,160,Z*C] merged view (z-neighbors
        #    become +-C shifts on the merged minor axis)
        def merged(p, g):
            Z, C = p.shape[3], p.shape[4]
            pm = p.reshape(p.shape[0], p.shape[1], p.shape[2], Z * C)
            gm = g.reshape(pm.shape)
            pf = pm.astype(jnp.float32)
            acc = gm.astype(jnp.float32)
            w = jnp.float32(1e-6 / 6.0)
            for ax, step in ((1, None), (2, None), (3, C)):
                n = pm.shape[ax]
                s = 1 if step is None else step
                pad_hi = [(0, 0)] * pm.ndim
                pad_hi[ax] = (0, s)
                pad_lo = [(0, 0)] * pm.ndim
                pad_lo[ax] = (s, 0)
                nxt = jnp.pad(jax.lax.slice_in_dim(pf, s, n, axis=ax), pad_hi)
                prv = jnp.pad(jax.lax.slice_in_dim(pf, 0, n - s, axis=ax),
                              pad_lo)
                iota = jax.lax.broadcasted_iota(jnp.int32, pm.shape, ax)
                d_f = jnp.clip(pf - nxt, -1.0, 1.0)
                d_b = jnp.clip(pf - prv, -1.0, 1.0)
                acc = acc + w * (jnp.where(iota < n - s, d_f, 0.0)
                                 + jnp.where(iota >= s, d_b, 0.0))
            return acc.astype(g.dtype).reshape(g.shape)

        t = timeit(jax.jit(merged), p, g)
        print(f"{name} {shape}: merged-zc   {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
