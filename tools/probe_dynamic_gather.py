"""Probe: tpu.dynamic_gather rate inside a Pallas kernel (round 2).

Mosaic lowers `jnp.take_along_axis(x, idx, axis=0)` with x [A, B] and idx
[A, B] to `tpu.dynamic_gather` (lowering.py:_gather_lowering_rule) — a VPU
sublane shuffle, the only in-VMEM gather primitive this toolchain exposes.
Constraint: in rows == out rows (a permutation-with-repeats of the resident
tile). Measures rows/s for the (table-tile in VMEM, per-block request idx)
pattern that the coherent-tile render gather engine would use.

Run on the real TPU: python tools/probe_dynamic_gather.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        float(jnp.sum(o[0] if isinstance(o, tuple) else o))
        best = min(best, time.perf_counter() - t0)
    return best


def run(A: int, C: int, n_blocks: int, dtype=jnp.bfloat16):
    """n_blocks grid steps; each DMAs its own [A, C] tile (pipelined by
    pallas BlockSpec) and dynamic-gathers A rows from it."""
    table = jax.random.normal(jax.random.PRNGKey(0), (n_blocks * A, C), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_blocks * A,), 0, A,
                             jnp.int32)

    def kernel(idx_ref, tile_ref, out_ref):
        rows = idx_ref[:]  # [A] int32 in-tile row ids
        idx2 = jnp.broadcast_to(rows[:, None], (A, C))
        out_ref[:] = jnp.take_along_axis(tile_ref[:], idx2, axis=0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((A,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * A, C), dtype),
    )
    fn = jax.jit(lambda i: call(i, table))
    try:
        t = bench(fn, idx)
        n = n_blocks * A
        print(json.dumps({
            "probe": "dynamic_gather", "A": A, "C": C, "ok": True,
            "rows_per_s_M": round(n / t / 1e6, 1),
            "ms": round(t * 1e3, 2),
        }))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "dynamic_gather", "A": A, "C": C,
                          "ok": False, "err": repr(e)[:400]}))


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    for A in (1024, 2048, 4096):
        run(A, 128, n_blocks=max(1, (4 * 1024 * 1024) // A))
    run(2048, 256, n_blocks=2048)


if __name__ == "__main__":
    main()
