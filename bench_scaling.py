"""Multi-device scaling benchmark: train-step throughput (rays/s) at 1..N
devices on a data mesh, reporting scaling efficiency (BASELINE: >85% at 2+
hosts).

On real pods run as-is (jax.distributed.initialize happens automatically
under multi-host launchers). Without TPU hardware it runs on virtual CPU
devices (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
to validate the mechanism; CPU numbers are not representative.

Prints one JSON line per device count + a final efficiency line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _maybe_force_cpu() -> None:
    """--cpu[=N]: run on N virtual CPU devices. The axon sitecustomize
    imports jax at interpreter startup, so JAX_PLATFORMS in the environment
    is NOT reliably honored — use jax.config.update + XLA_FLAGS before the
    backend initializes (same dance as tests/conftest.py)."""
    arg = next((a for a in sys.argv[1:] if a.startswith("--cpu")), None)
    if arg is None:
        return
    n = int(arg.split("=")[1]) if "=" in arg else 8
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    _maybe_force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unboundednerfpytorch_tpu.configs.schema import ModelRenderConfig, TrainStageConfig
    from unboundednerfpytorch_tpu.models import fourier_grid as fg
    from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod
    from unboundednerfpytorch_tpu.train.step import create_train_state, make_train_step

    n_avail = len(jax.devices())
    mr = ModelRenderConfig(
        num_voxels_rgb=64**3, num_voxels_density=64**3,
        num_voxels_base_rgb=64**3, num_voxels_base_density=64**3,
        rgbnet_dim=8, alpha_init=1e-2, fast_color_thres=1e-4,
        fourier_freq_num=2, bg_len=0.2, stepsize=1.0,
    )
    cfg = fg.config_from(mr, (-3, -3, -3), (3, 3, 3), 64**3, 64**3)
    tc = TrainStageConfig(
        N_rand=4096, pervoxel_lr=False,
        skip_zero_grad_fields=("density", "k0"),
        weight_entropy_last=0.001, weight_rgbper=0.01, weight_distortion=0.01,
    )

    def fwd(p, ro, rd, vd, key, img_index=None):
        return fg.forward(p, cfg, ro, rd, vd, bg=1.0)

    per_device_rays = 512
    results = {}
    counts = [n for n in (1, 2, 4, 8) if n <= n_avail]
    for n_dev in counts:
        mesh = mesh_mod.make_mesh(n_dev)
        params = fg.create(cfg, jax.random.PRNGKey(0))
        n_rays = per_device_rays * n_dev  # weak scaling: fixed work per device

        # the SAME step the flagship loop compiles (loop.compile_step):
        # make_train_step core + fused device-side sampler, batch sharded
        # over the data axis, params/store replicated
        from unboundednerfpytorch_tpu.train.step import make_sampled_step

        core = make_train_step(
            fwd, tc, world_size_max=float(max(cfg.world_size_density)),
        )
        sstep = make_sampled_step(core, n_rays, mesh=mesh)

        k = jax.random.PRNGKey(0)
        ro = jax.random.uniform(k, (65536, 3), minval=1.5, maxval=3.0)
        rd = -ro
        store = {
            "rgb": jnp.ones((65536, 3)) * 0.5,
            "rays_o": ro,
            "rays_d": rd,
            "viewdirs": rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        }
        rep_sh = mesh_mod.replicated(mesh)
        store = jax.device_put(store, rep_sh)
        state = jax.device_put(create_train_state(params, tc), rep_sh)

        with mesh:
            state, m = sstep(state, store, jax.random.PRNGKey(1))
            float(m["loss"])  # warm
            reps = 4
            t0 = time.perf_counter()
            for r in range(reps):
                state, m = sstep(state, store, jax.random.PRNGKey(r))
                float(m["loss"])  # forces completion each step
            dt = (time.perf_counter() - t0) / reps
        rays_s = n_rays / dt
        results[n_dev] = rays_s
        print(json.dumps({
            "devices": n_dev, "train_rays_per_s": round(rays_s, 1),
            "s_per_step": round(dt, 4),
        }), flush=True)

    if len(results) > 1:
        base = results[counts[0]] / counts[0]
        eff = {n: round(results[n] / (n * base), 3) for n in counts}
        print(json.dumps({
            "metric": "weak_scaling_efficiency", "value": eff,
            "platform": jax.default_backend(),
            "note": ("virtual CPU devices share one host's cores - mechanism "
                     "validation only, not a throughput measurement"
                     if jax.default_backend() == "cpu" else ""),
        }))

    # --- render scaling: one image rendered cooperatively per mesh size ----
    import numpy as np

    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.render import renderer

    params = fg.create(cfg, jax.random.PRNGKey(0))

    def rfwd(aux, ro, rd, vd):
        return fg.forward(aux, cfg, ro, rd, vd, bg=1.0)

    H = W = 128
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]],
                 np.float32)
    pose = synthetic.look_at_pose(np.array([2.5, 0.3, 0.8]), np.zeros(3))
    render_results = {}
    for n_dev in counts:
        mesh = mesh_mod.make_mesh(n_dev) if n_dev > 1 else None
        renderer.render_image(
            rfwd, H, W, K, pose[:3, :4], chunk=2048, aux=params, mesh=mesh
        )  # warm/compile
        t0 = time.perf_counter()
        for rep in range(2):
            renderer.render_image(
                rfwd, H, W, K, pose[:3, :4], chunk=2048, aux=params, mesh=mesh
            )
        dt = (time.perf_counter() - t0) / 2
        render_results[n_dev] = H * W / dt
        print(json.dumps({
            "devices": n_dev, "render_rays_per_s": round(H * W / dt, 1),
        }), flush=True)
    if len(render_results) > 1:
        base = render_results[counts[0]]
        eff = {n: round(render_results[n] / (n * base), 3) for n in counts}
        print(json.dumps({
            "metric": "render_strong_scaling_efficiency", "value": eff,
            "platform": jax.default_backend(),
            "note": ("virtual CPU devices share one host's cores - mechanism "
                     "validation only, not a throughput measurement"
                     if jax.default_backend() == "cpu" else ""),
        }))


if __name__ == "__main__":
    main()
