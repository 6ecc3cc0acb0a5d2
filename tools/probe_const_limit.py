"""Probe the relay compile-transport's request-size limit.

The staged constant renderer (render/staged_const.py) failed at stage D with
``HTTP 413: Failed to buffer the request body: length limit exceeded`` when
a per-bank k0 packed table (~800MB bf16) rode as a compile-time constant.
This probe compiles a minimal constant-table gather at increasing constant
sizes to locate the cap, so ``const_max_bytes`` can be set just under it.

Usage: python tools/probe_const_limit.py [mb ...]   (default: 448 320 192)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def try_size(mb: int) -> bool:
    rows = mb * (1 << 20) // (128 * 2)  # bf16, 128-lane rows
    table = jnp.asarray(
        np.random.RandomState(0).randn(rows, 128), jnp.bfloat16
    )
    idx = jnp.arange(8192, dtype=jnp.int32) * 7919 % rows

    @jax.jit
    def gather(i, _t=table):  # closed over -> compile-time constant
        return jnp.take(_t, i, axis=0).astype(jnp.float32).sum()

    t0 = time.time()
    try:
        v = float(gather(idx))
        print(f"{mb}MB: OK ({time.time()-t0:.0f}s, sum={v:.1f})", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{mb}MB: FAIL ({time.time()-t0:.0f}s) {str(e)[:120]}",
              flush=True)
        return False


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [448, 320, 192]
    for s in sizes:
        try_size(s)
