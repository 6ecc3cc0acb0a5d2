"""Empirical TPU gather/scatter rate probe (round 2 design input).

Measures XLA row-gather throughput as a function of row width, dtype and
table size, plus scatter-add rates — the numbers that decide the packed-corner
gather layout (1 row of 8*C channels vs 8 rows of C channels per trilerp).

Run on the real TPU: python tools/probe_gather.py
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def bench(fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))  # force host fetch (relay completion guarantee)
    best = float("inf")
    for r in range(reps):
        # fresh indices each rep: relay memoizes identical (exe, inputs)
        t0 = time.perf_counter()
        o = fn_j(*args[:-1], args[-1] + r)
        float(jnp.sum(o))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    N = 4 * 1024 * 1024  # gathered rows per run

    def make_idx(key, t):
        return jax.random.randint(key, (N,), 0, t)

    key = jax.random.PRNGKey(0)

    for T in (1 << 20, 1 << 22):
        for C, dt in [
            (1, jnp.bfloat16), (8, jnp.bfloat16), (13, jnp.bfloat16),
            (26, jnp.bfloat16), (52, jnp.bfloat16), (104, jnp.bfloat16),
            (128, jnp.bfloat16), (13, jnp.float32), (104, jnp.float32),
            (104, jnp.int8), (1, jnp.int8),
        ]:
            table = jax.random.normal(key, (T, C)).astype(dt)

            def gather(tab, seed):
                idx = make_idx(jax.random.PRNGKey(seed), tab.shape[0])
                return jnp.take(tab, idx, axis=0).astype(jnp.float32).sum(-1)

            dt_s = bench(gather, table, 7)
            print(json.dumps({
                "op": "gather", "T": T, "C": C, "dtype": str(dt.__name__),
                "rows_per_s": round(N / dt_s / 1e6, 1),
            }), flush=True)

    # 3D advanced-index gather (maskcache-style [X,Y,Z] bool lookup)
    for XS in (160,):
        vol = jax.random.uniform(key, (XS, XS, XS)) < 0.05

        def mask_lookup(v, seed):
            ijk = jax.random.randint(jax.random.PRNGKey(seed), (N, 3), 0, XS)
            return v[ijk[:, 0], ijk[:, 1], ijk[:, 2]].astype(jnp.float32)

        dt_s = bench(mask_lookup, vol, 7)
        print(json.dumps({
            "op": "mask3d", "X": XS, "rows_per_s": round(N / dt_s / 1e6, 1),
        }), flush=True)

    # scatter-add (backward of gather)
    for C in (13, 104):
        T = 1 << 22
        vals = jax.random.normal(key, (N, C), dtype=jnp.float32)

        def scat(v, seed):
            idx = make_idx(jax.random.PRNGKey(seed), T)
            out = jnp.zeros((T, C), jnp.float32)
            return out.at[idx].add(v).sum(-1)

        dt_s = bench(scat, vals, 7)
        print(json.dumps({
            "op": "scatter_add", "T": T, "C": C,
            "rows_per_s": round(N / dt_s / 1e6, 1),
        }), flush=True)

    # take_along_axis per-ray compaction style gather: [R, S, C] -> [R, B, C]
    R, S, B, C = 8192, 268, 96, 3
    x = jax.random.normal(key, (R, S, C))

    def taa(x, seed):
        sel = jax.random.randint(jax.random.PRNGKey(seed), (R, B, 1), 0, S)
        return jnp.take_along_axis(x, jnp.broadcast_to(sel, (R, B, C)), axis=1)

    dt_s = bench(taa, x, 7)
    print(json.dumps({
        "op": "take_along_axis", "rows_per_s": round(R * B / dt_s / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
