"""Decisive probes for the coherent-box Pallas gather engine (round 2).

Three rates decide the design:
  P1  in-kernel VMEM row gather via scalar fori_loop (idx in SMEM)
      - the only general in-VMEM gather Mosaic can lower on this toolchain
        (tpu.dynamic_gather is an intra-vreg shuffle: "Multiple source vregs
        along gather dimension"; see tools/probe_dynamic_gather.py history)
  P2  box DMA HBM->VMEM with dynamic (scalar-prefetched) origins
  P3  XLA gather with slice_sizes=(K, C): are K-row slices per descriptor
      ~free (per-descriptor cost) or per-row?

Run on the real TPU: python tools/probe_kernel_gather.py
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
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        float(jnp.sum(o))
        best = min(best, time.perf_counter() - t0)
    return best


def p1_rowloop(A=2048, C=128, n_blocks=512, dtype=jnp.bfloat16):
    """Each grid step: [A, C] tile arrives in VMEM (pipelined), gather A rows
    of it into the output via a scalar loop (indices from SMEM)."""
    N = n_blocks * A
    table = jax.random.normal(jax.random.PRNGKey(0), (N, C), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, A, jnp.int32)

    def kernel(idx_ref, tile_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = tile_ref[idx_ref[i], :]
            return 0

        jax.lax.fori_loop(0, A, body, 0, unroll=8)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((A,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((A, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), dtype),
    )
    fn = jax.jit(lambda i: call(i, table))
    try:
        t = bench(fn, idx)
        print(json.dumps({"probe": "p1_rowloop", "A": A, "C": C, "ok": True,
                          "M_rows_per_s": round(N / t / 1e6, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        msg = repr(e)
        key = [l for l in msg.splitlines() if "Not implemented" in l or "error:" in l]
        print(json.dumps({"probe": "p1_rowloop", "ok": False,
                          "err": (key[0][-160:] if key else msg[:200])}),
              flush=True)


def p2_boxdma(BX=16, BY=16, BZ=8, C=128, n_blocks=2048, dtype=jnp.bfloat16):
    """Each grid step DMAs a (BX, BY, BZ, C) box at a dynamic origin from an
    HBM-resident 4D table into VMEM scratch and reduces it."""
    X = Y = Z = 161
    table = jax.random.normal(jax.random.PRNGKey(0), (X, Y, Z, C), dtype)
    org = jnp.stack(
        [
            jax.random.randint(jax.random.PRNGKey(2), (n_blocks,), 0, X - BX),
            jax.random.randint(jax.random.PRNGKey(3), (n_blocks,), 0, Y - BY),
            jax.random.randint(jax.random.PRNGKey(4), (n_blocks,), 0, Z - BZ),
        ],
        axis=-1,
    ).astype(jnp.int32)

    def kernel(org_ref, table_ref, out_ref, box, sem):
        b = pl.program_id(0)
        ox = org_ref[b, 0]
        oy = org_ref[b, 1]
        oz = org_ref[b, 2]
        cp = pltpu.make_async_copy(
            table_ref.at[pl.ds(ox, BX), pl.ds(oy, BY), pl.ds(oz, BZ), :],
            box,
            sem,
        )
        cp.start()
        cp.wait()
        out_ref[0, :] = jnp.sum(
            box[:].astype(jnp.float32), axis=(0, 1, 2)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, C), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BX, BY, BZ, C), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        call_kernel := kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, C), jnp.float32),
    )
    fn = jax.jit(lambda o: call(o, table))
    try:
        t = bench(fn, org)
        bytes_moved = n_blocks * BX * BY * BZ * C * jnp.dtype(dtype).itemsize
        print(json.dumps({
            "probe": "p2_boxdma", "box": [BX, BY, BZ], "ok": True,
            "GB_per_s": round(bytes_moved / t / 1e9, 1),
            "boxes_per_s_K": round(n_blocks / t / 1e3, 1),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        msg = repr(e)
        key = [l for l in msg.splitlines() if "Not implemented" in l or "error:" in l]
        print(json.dumps({"probe": "p2_boxdma", "ok": False,
                          "err": (key[0][-160:] if key else msg[:200])}),
              flush=True)


def p3_slice_gather(K=8, C=128, N_slices=1 << 19, dtype=jnp.bfloat16):
    """XLA gather of K consecutive rows per index."""
    T = 1 << 22
    table = jax.random.normal(jax.random.PRNGKey(0), (T, C), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N_slices,), 0, T - K,
                             jnp.int32)

    def f(i):
        out = jax.lax.gather(
            table,
            i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(K, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return jnp.sum(out.astype(jnp.float32), axis=(1, 2))

    fn = jax.jit(f)
    t = bench(fn, idx)
    print(json.dumps({
        "probe": "p3_slice_gather", "K": K, "ok": True,
        "M_slices_per_s": round(N_slices / t / 1e6, 1),
        "M_rows_per_s": round(N_slices * K / t / 1e6, 1),
    }), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    p1_rowloop(A=2048, C=128, n_blocks=512)
    p1_rowloop(A=4096, C=128, n_blocks=256)
    p2_boxdma(16, 16, 8, 128, 2048)
    p2_boxdma(16, 16, 16, 128, 1024)
    for K in (1, 2, 4, 8):
        p3_slice_gather(K=K)


if __name__ == "__main__":
    main()
