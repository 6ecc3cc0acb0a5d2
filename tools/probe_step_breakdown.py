"""Probe: where the production train step's time goes at the flagship
config (160^3 / 7-bank / rgbnet-12, 2048 rays, budget 96).

Round-3 ablation (ROADMAP): fwd 86 ms, fwd+bwd+masked-Adam 319 ms, +TV
(Pallas) ~383 ms expected. This probe splits bwd from the optimizer:
  a) forward (loss value only)
  b) value_and_grad
  c) value_and_grad + masked Adam update
  d) full production step (make_train_step, fused TV)
Run serially with nothing else on the TPU: python tools/probe_step_breakdown.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.configs.schema import (
    ModelRenderConfig, TrainStageConfig,
)
from unboundednerfpytorch_tpu.models import fourier_grid as fg
from unboundednerfpytorch_tpu.ops import losses as L
from unboundednerfpytorch_tpu.optim import factory, masked_adam
from unboundednerfpytorch_tpu.train.step import (
    create_train_state, make_train_step,
)

N = 2048
ITERS = 10


def main():
    mr = ModelRenderConfig(
        num_voxels_rgb=160**3, num_voxels_density=160**3,
        num_voxels_base_rgb=160**3, num_voxels_base_density=160**3,
        rgbnet_dim=12, alpha_init=1e-4, fast_color_thres=1e-4,
        fourier_freq_num=3, bg_len=0.2, stepsize=1.0,
        grid_dtype="bfloat16", sample_budget=96, budget_probe_stride=2,
        color_budget=32,
    )
    cfg = fg.config_from(mr, (-3, -3, -3), (3, 3, 3), 160**3, 160**3)
    params = fg.create(cfg, jax.random.PRNGKey(0))
    tcfg = TrainStageConfig(
        N_iters=1, N_rand=N, pervoxel_lr=False,
        weight_entropy_last=1e-3, weight_rgbper=1e-2,
        weight_tv_density=1e-6, weight_tv_k0=1e-7,
        tv_before=1 << 30, tv_dense_before=1 << 30,
        skip_zero_grad_fields=("density", "k0"),
    )

    key = jax.random.PRNGKey(1)
    ro = jnp.ones((N, 3)) * 2.5 + 0.1 * jax.random.normal(key, (N, 3))
    rd = -ro / jnp.linalg.norm(ro, axis=-1, keepdims=True)
    batch = {
        "rgb": jnp.full((N, 3), 0.4), "rays_o": ro, "rays_d": rd,
        "viewdirs": rd,
    }

    def fwd(p, ro, rd, vd, key=None, img_index=None):
        return fg.forward(p, cfg, ro, rd, vd, bg=1.0)

    trainable, hyper = factory.split_trainable(params, tcfg)

    def loss_fn(tr, batch):
        merged = factory.merge_trainable(params, tr)
        res = fwd(merged, batch["rays_o"], batch["rays_d"], batch["viewdirs"])
        loss = L.mse(res.rgb_marched, batch["rgb"])
        loss = loss + 1e-3 * L.entropy_last(res.alphainv_last)
        loss = loss + 1e-2 * L.rgbper(
            res.raw_rgb, batch["rgb"], res.weights, N, mask=res.mask
        )
        return loss

    def timeit(f, *args, chain_idx=None):
        """Chained timing through fori-style host loop with one final fetch;
        first call compiles."""
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(*args)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        return (time.perf_counter() - t0) / ITERS

    a = timeit(jax.jit(lambda tr, b: loss_fn(tr, b)), trainable, batch)
    print(f"a) forward-only loss:        {a*1e3:7.1f} ms", flush=True)

    vg = jax.jit(lambda tr, b: jax.value_and_grad(loss_fn)(tr, b))
    b = timeit(vg, trainable, batch)
    print(f"b) value_and_grad:           {b*1e3:7.1f} ms (bwd ~{(b-a)*1e3:.0f})",
          flush=True)

    state = create_train_state(params, tcfg)

    def vg_adam(st, bt):
        tr, hy = factory.split_trainable(st.params, tcfg)
        loss, grads = jax.value_and_grad(loss_fn)(tr, bt)
        new_tr, new_opt = masked_adam.update(
            tr, grads, st.opt_state, hy, lr_scale=1.0, per_lr=st.per_lr
        )
        return st.replace(
            params=factory.merge_trainable(st.params, new_tr),
            opt_state=new_opt,
        )

    jc = jax.jit(vg_adam, donate_argnums=(0,))
    st = jc(state, batch)
    jax.block_until_ready(jax.tree.leaves(st)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st = jc(st, batch)
    jax.block_until_ready(jax.tree.leaves(st)[0])
    c = (time.perf_counter() - t0) / ITERS
    print(f"c) + masked Adam:            {c*1e3:7.1f} ms (adam ~{(c-b)*1e3:.0f})",
          flush=True)

    tv_fused = None
    if jax.default_backend() == "tpu":
        from unboundednerfpytorch_tpu.ops.pallas import tv as ptv
        tv_fused = ptv.make_tv_fused()
    step = make_train_step(
        fwd, tcfg, world_size_max=float(max(cfg.world_size)),
        donate=True, tv_fused=tv_fused,
    )
    jstep = jax.jit(step, donate_argnums=(0,))
    st = create_train_state(params, tcfg)
    st, m = jstep(st, batch, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, m = jstep(st, batch, key)
    jax.block_until_ready(m["loss"])
    d = (time.perf_counter() - t0) / ITERS
    print(f"d) full step (fused TV):     {d*1e3:7.1f} ms (tv+misc ~{(d-c)*1e3:.0f})",
          flush=True)


if __name__ == "__main__":
    main()
