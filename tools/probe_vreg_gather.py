"""Probe: intra-vreg double-shuffle gather rate (coherent-box engine core).

Mosaic's only in-VMEM gather primitive is tpu.dynamic_gather, an INTRA-VREG
shuffle, and it only lowers for f32 data + i32 indices (bf16 requires 16-bit
indices which jax's take_along_axis always promotes — fails to lower).
So the box lives in VMEM as f32 vregs of (8, 128) and a request
(dx, dy, dz) into a box of [16, 16, 16z x 8ch] costs:
  1. v  = box[(dx*2 + dy//8)]                  aligned dynamic vreg load
  2. r1 = shuffle_sublanes(v, dy % 8)          tpu.dynamic_gather dim 0
  3. r2 = shuffle_lanes(r1, dz*8 + lane%8)     tpu.dynamic_gather dim 1
  4. select-accumulate the request's 8 lanes into an output vreg sublane
8 requests assemble one [8, 128] output vreg. If this composes at >100M
requests/s it beats XLA row gathers (~50-60M rows/s) and justifies the
coherent-box stage-1 render kernel.

Run on the real TPU: python tools/probe_vreg_gather.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 4096  # requests per grid step
NV = 32     # vregs per box: 16x(16x16x8) f32 -> [32, 8, 128]


def kernel(code_ref, box_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_mod8 = lane % 8

    def group(g, _):
        acc = jnp.zeros((8, 128), jnp.float32)

        def one(i, acc):
            r = g * 8 + i
            code = code_ref[r]
            dx = code // 256
            dy = (code // 16) % 16
            dz = code % 16
            v = box_ref[dx * 2 + dy // 8]  # [8, 128] f32 vreg
            r1 = jnp.take_along_axis(
                v, jnp.broadcast_to(dy % 8, (8, 128)), axis=0
            )
            idx2 = dz * 8 + lane_mod8
            r2 = jnp.take_along_axis(r1, idx2, axis=1)
            sel = (sub == i) & (lane < 8)
            return jnp.where(sel, r2, acc)

        acc = jax.lax.fori_loop(0, 8, one, acc, unroll=8)
        out_ref[pl.ds(g * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, BLK // 8, group, 0)


def main():
    n_blocks = 256
    key = jax.random.PRNGKey(0)
    box = jax.random.normal(key, (n_blocks * NV, 8, 128), jnp.float32)
    dxyz = jax.random.randint(
        jax.random.PRNGKey(1), (n_blocks * BLK, 3), 0, 16, jnp.int32
    )
    code = dxyz[:, 0] * 256 + dxyz[:, 1] * 16 + dxyz[:, 2]

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((NV, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLK, 128), jnp.float32),
    )
    fn = jax.jit(lambda d: call(d, box))
    try:
        out = fn(code)
        jax.block_until_ready(out)
        float(jnp.sum(out))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = fn(code)
            float(jnp.sum(o))
            best = min(best, time.perf_counter() - t0)
        n = n_blocks * BLK
        print(json.dumps({"probe": "vreg_gather_f32", "ok": True,
                          "M_req_per_s": round(n / best / 1e6, 1)}), flush=True)
        # correctness spot check: request r of block 0
        import numpy as np

        b0 = np.asarray(box[:NV], np.float32)
        d0 = np.asarray(dxyz[:8])
        o0 = np.asarray(out[:8])
        for i in range(8):
            dx, dy, dz = d0[i]
            ref = b0[dx * 2 + dy // 8, dy % 8, dz * 8 : dz * 8 + 8]
            got = o0[i, :8]
            assert np.allclose(ref, got, atol=1e-5), (i, ref, got)
        print(json.dumps({"probe": "vreg_gather_correct", "ok": True}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()


if __name__ == "__main__":
    main()
