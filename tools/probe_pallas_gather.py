"""Probe: can Mosaic lower in-VMEM gathers, and at what rate? (round 2)

Round-1 finding was that `jnp.take`/`take_along_axis` inside a Pallas TPU
kernel failed to lower. Re-check on the current toolchain (jax 0.9.0) and, if
it lowers, measure the achievable row-gather rate from a VMEM-resident table —
the number that decides whether a tiled DMA+VMEM-gather kernel can beat XLA's
HBM row gathers (~40-90M rows/s, tools/probe_gather.py).

Run on the real TPU: python tools/probe_pallas_gather.py
"""

from __future__ import annotations

import json
import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        float(jnp.sum(o))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))

    T = 32 * 1024          # table rows (fits VMEM: 32K x 128 x 2B = 8MB... use bf16 64 ch)
    C = 128                # row channels
    N = 512 * 1024         # gathered rows
    BLK = 8 * 1024         # rows gathered per grid step

    table = jax.random.normal(jax.random.PRNGKey(0), (T, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    # --- attempt 1: whole table in VMEM (via BlockSpec), jnp.take inside ---
    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    try:
        gathered = pl.pallas_call(
            kernel,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, C), table.dtype),
        )
        fn = jax.jit(lambda i: gathered(i, table))
        t = bench(fn, idx)
        print(json.dumps({"probe": "vmem_take", "ok": True,
                          "rows_per_s": round(N / t / 1e6, 1), "unit": "M rows/s"}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "vmem_take", "ok": False,
                          "err": repr(e)[:300]}))
        traceback.print_exc()

    # --- attempt 2: dynamic_slice row loop (fori) from VMEM table ---
    def kernel2(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = table_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, BLK, body, 0)

    try:
        gathered2 = pl.pallas_call(
            kernel2,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, C), table.dtype),
        )
        fn2 = jax.jit(lambda i: gathered2(i, table))
        t = bench(fn2, idx)
        print(json.dumps({"probe": "vmem_rowloop", "ok": True,
                          "rows_per_s": round(N / t / 1e6, 1), "unit": "M rows/s"}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "vmem_rowloop", "ok": False,
                          "err": repr(e)[:300]}))

    # --- baseline: XLA HBM gather of the same shape ---
    fnx = jax.jit(lambda i: jnp.take(table, i, axis=0))
    t = bench(fnx, idx)
    print(json.dumps({"probe": "xla_take", "ok": True,
                      "rows_per_s": round(N / t / 1e6, 1), "unit": "M rows/s"}))


if __name__ == "__main__":
    main()
