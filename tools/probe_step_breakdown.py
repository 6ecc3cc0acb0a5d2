"""Probe: where the production train step's time goes (flagship-shaped
7-bank / rgbnet-12 model, 2048 rays, budget 96 — at 128^3: the 160^3
no-donation variants do not fit one 16GB chip, and the fwd/bwd/adam RATIO
is what this probe is for).

All variants are measured the same way: a donated state chained through a
host loop (the axon relay memoizes identical dispatches and adds variance
to same-args timing, so every phase must thread fresh state):
  a) forward only        (state -> state, loss folded into a param nudge)
  b) + backward          (SGD: p - 1e-8 * grad)
  c) + masked Adam       (full optimizer, f32 moments)
  d) full production step (make_train_step: + fused Pallas TV, schedules)
Run serially with nothing else on the TPU: python tools/probe_step_breakdown.py
"""
from __future__ import annotations

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

N = int(os.environ.get("PROBE_N", 2048))
ITERS = int(os.environ.get("PROBE_ITERS", 10))
VOX = int(os.environ.get("PROBE_VOX", 128))  # CPU smoke: PROBE_VOX=24


def main():
    mr = ModelRenderConfig(
        num_voxels_rgb=VOX**3, num_voxels_density=VOX**3,
        num_voxels_base_rgb=VOX**3, num_voxels_base_density=VOX**3,
        rgbnet_dim=12, alpha_init=1e-4, fast_color_thres=1e-4,
        fourier_freq_num=3, bg_len=0.2, stepsize=1.0,
        grid_dtype="bfloat16",
        # tiny CPU smokes (PROBE_VOX<64) shrink the march below the
        # flagship budgets — scale them down so the budget paths still run
        sample_budget=96 if VOX >= 64 else 16,
        budget_probe_stride=2,
        color_budget=32 if VOX >= 64 else 8,
    )
    cfg = fg.config_from(mr, (-3, -3, -3), (3, 3, 3), VOX**3, VOX**3)
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

    def loss_fn(tr, frozen, batch):
        merged = factory.merge_trainable(frozen, tr)
        res = fwd(merged, batch["rays_o"], batch["rays_d"], batch["viewdirs"])
        loss = L.mse(res.rgb_marched, batch["rgb"])
        loss = loss + 1e-3 * L.entropy_last(res.alphainv_last)
        loss = loss + 1e-2 * L.rgbper(
            res.raw_rgb, batch["rgb"], res.weights, N, mask=res.mask
        )
        return loss

    def timeit_state(step_fn, make_state):
        """Chained donated-state host loop; one scalar fetch at the end."""
        st = make_state()
        jstep = jax.jit(step_fn, donate_argnums=(0,))
        st = jstep(st, batch)
        jax.block_until_ready(jax.tree.leaves(st)[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st = jstep(st, batch)
        jax.block_until_ready(jax.tree.leaves(st)[0])
        leaf = jax.tree.leaves(st)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / ITERS
        del st, jstep
        jax.clear_caches()
        import gc
        gc.collect()
        return dt

    def fresh_params():
        return fg.create(cfg, jax.random.PRNGKey(0))

    only_ts = os.environ.get("PROBE_ONLY_TWO_STAGE") == "1"

    # a) forward only: nudge one param by the loss so nothing folds away
    def fwd_step(st, bt):
        tr, _ = factory.split_trainable(st.params, tcfg)
        loss = loss_fn(tr, st.params, bt)
        dg = st.params.density
        return st.replace(params=st.params.replace(
            density=dg.replace(grid=dg.grid + loss.astype(dg.grid.dtype) * 0)
        ))

    a = (0.0 if only_ts else timeit_state(
        fwd_step, lambda: create_train_state(fresh_params(), tcfg)))
    if not only_ts:
        print(f"a) forward only:             {a*1e3:7.1f} ms", flush=True)

    # b) + backward (SGD consume)
    def sgd_step(st, bt):
        tr, _ = factory.split_trainable(st.params, tcfg)
        grads = jax.grad(loss_fn)(tr, st.params, bt)
        new_tr = jax.tree.map(lambda p, g: p - 1e-8 * g.astype(p.dtype),
                              tr, grads)
        return st.replace(params=factory.merge_trainable(st.params, new_tr))

    b = (0.0 if only_ts else timeit_state(
        sgd_step, lambda: create_train_state(fresh_params(), tcfg)))
    if not only_ts:
        print(f"b) + backward (sgd):         {b*1e3:7.1f} ms (bwd ~{(b-a)*1e3:.0f})",
              flush=True)

    # c) + masked Adam
    def adam_step(st, bt):
        tr, hy = factory.split_trainable(st.params, tcfg)
        grads = jax.grad(loss_fn)(tr, st.params, bt)
        new_tr, new_opt = masked_adam.update(
            tr, grads, st.opt_state, hy, lr_scale=1.0, per_lr=st.per_lr
        )
        return st.replace(
            params=factory.merge_trainable(st.params, new_tr),
            opt_state=new_opt,
        )

    c = (0.0 if only_ts else timeit_state(
        adam_step, lambda: create_train_state(fresh_params(), tcfg)))
    if not only_ts:
        print(f"c) + masked Adam:            {c*1e3:7.1f} ms (adam ~{(c-b)*1e3:.0f})",
              flush=True)

    # d) full production step (fused Pallas TV on TPU)
    tv_fused = None
    if jax.default_backend() == "tpu":
        from unboundednerfpytorch_tpu.ops.pallas import tv as ptv
        tv_fused = ptv.make_tv_fused()
    core = make_train_step(
        fwd, tcfg, world_size_max=float(max(cfg.world_size)),
        tv_fused=tv_fused,
    )
    d = (0.0 if only_ts else timeit_state(
        lambda st, bt: core(st, bt, key)[0],
        lambda: create_train_state(fresh_params(), tcfg)))
    if not only_ts:
        print(f"d) full step (fused TV):     {d*1e3:7.1f} ms (tv+misc ~{(d-c)*1e3:.0f})",
              flush=True)

    # --- two-stage TRAINING forward phases (VERDICT r4 #3 diagnosis) ------
    import dataclasses

    from unboundednerfpytorch_tpu.ops import alpha as alpha_ops
    from unboundednerfpytorch_tpu.ops import packed as packed_ops
    from unboundednerfpytorch_tpu.ops import sampling

    cfg_ts = dataclasses.replace(
        cfg, train_survivor_budget=48 if VOX >= 64 else 8
    )

    # e) stage A ONLY: stop-grad folded density probe + survivor selection
    def stage_a_step(st, bt):
        p = st.params
        pts, _, t = fg.sample_ray(cfg_ts, bt["rays_o"], bt["rays_d"])
        sel, selm = fg.budget_select(
            p, cfg_ts, pts, bt["rays_o"], bt["rays_d"], t
        )
        S = cfg_ts.sample_budget
        stk = jnp.concatenate(
            [pts, jnp.broadcast_to(t, pts.shape[:2])[..., None]], -1
        )
        g = sampling.gather_samples(stk, sel)
        pts_b = g[..., :3]
        B = p.density.grid.shape[0]
        dims = p.density.grid.shape[1:4]
        sg = jax.lax.stop_gradient
        fold = 16
        c01b = jnp.moveaxis(fg._bank_coords01(cfg_ts, sg(pts_b)), -2, 0)
        acc = None
        for bb in range(B):
            table = packed_ops.pack_corners_folded(sg(p.density.grid[bb]), fold)
            base, w = packed_ops.corner_base_and_weights(c01b[bb], dims)
            v = packed_ops.packed_trilerp_folded(table, base, w, 1, fold)
            acc = v if acc is None else acc + v
        val = (acc[..., 0] / B).sum()
        dg = p.density
        return st.replace(params=p.replace(
            density=dg.replace(grid=dg.grid + val.astype(dg.grid.dtype) * 0)
        ))

    e = timeit_state(stage_a_step,
                     lambda: create_train_state(fresh_params(), tcfg))
    print(f"e) budget+stageA probe only: {e*1e3:7.1f} ms", flush=True)

    # e-sub-phases: where inside stage A the time hides
    def _nudge(st, val):
        dg = st.params.density
        return st.replace(params=st.params.replace(
            density=dg.replace(grid=dg.grid + val.astype(dg.grid.dtype) * 0)
        ))

    def e0_geom(st, bt):  # contracted sampling only
        pts, _, t = fg.sample_ray(cfg_ts, bt["rays_o"], bt["rays_d"])
        return _nudge(st, pts.sum())

    def e1_probe(st, bt):  # + mask probe + top_k compaction
        pts, _, t = fg.sample_ray(cfg_ts, bt["rays_o"], bt["rays_d"])
        sel, selm = fg.budget_select(
            st.params, cfg_ts, pts, bt["rays_o"], bt["rays_d"], t
        )
        return _nudge(st, sel.sum().astype(jnp.float32))

    def e2_gather(st, bt):  # + the budget coordinate gather
        pts, _, t = fg.sample_ray(cfg_ts, bt["rays_o"], bt["rays_d"])
        sel, selm = fg.budget_select(
            st.params, cfg_ts, pts, bt["rays_o"], bt["rays_d"], t
        )
        stk = jnp.concatenate(
            [pts, jnp.broadcast_to(t, pts.shape[:2])[..., None]], -1
        )
        g = sampling.gather_samples(stk, sel)
        return _nudge(st, g.sum())

    def e3_coords(st, bt):  # + per-bank coords + corner base/weight math
        pts, _, t = fg.sample_ray(cfg_ts, bt["rays_o"], bt["rays_d"])
        sel, selm = fg.budget_select(
            st.params, cfg_ts, pts, bt["rays_o"], bt["rays_d"], t
        )
        stk = jnp.concatenate(
            [pts, jnp.broadcast_to(t, pts.shape[:2])[..., None]], -1
        )
        g = sampling.gather_samples(stk, sel)
        pts_b = g[..., :3]
        dims = st.params.density.grid.shape[1:4]
        sg = jax.lax.stop_gradient
        c01b = jnp.moveaxis(fg._bank_coords01(cfg_ts, sg(pts_b)), -2, 0)
        acc = None
        for bb in range(st.params.density.grid.shape[0]):
            base, w = packed_ops.corner_base_and_weights(c01b[bb], dims)
            v = base.astype(jnp.float32).sum() + w.sum()
            acc = v if acc is None else acc + v
        return _nudge(st, acc)

    for tag, fn in (("e0 geometry", e0_geom), ("e1 +probe/topk", e1_probe),
                    ("e2 +budget gather", e2_gather),
                    ("e3 +coords math", e3_coords)):
        dt = timeit_state(fn, lambda: create_train_state(fresh_params(), tcfg))
        print(f"   {tag}: {dt*1e3:7.1f} ms", flush=True)

    # f) full two-stage forward only
    def fwd_ts(p, ro, rd, vd, key=None, img_index=None):
        return fg.forward(p, cfg_ts, ro, rd, vd, bg=1.0)

    def loss_fn_ts(tr, frozen, batch):
        merged = factory.merge_trainable(frozen, tr)
        res = fwd_ts(merged, batch["rays_o"], batch["rays_d"], batch["viewdirs"])
        loss = L.mse(res.rgb_marched, batch["rgb"])
        loss = loss + 1e-3 * L.entropy_last(res.alphainv_last)
        loss = loss + 1e-2 * L.rgbper(
            res.raw_rgb, batch["rgb"], res.weights, N, mask=res.mask
        )
        return loss

    def fwd_ts_step(st, bt):
        tr, _ = factory.split_trainable(st.params, tcfg)
        loss = loss_fn_ts(tr, st.params, bt)
        dg = st.params.density
        return st.replace(params=st.params.replace(
            density=dg.replace(grid=dg.grid + loss.astype(dg.grid.dtype) * 0)
        ))

    f = timeit_state(fwd_ts_step,
                     lambda: create_train_state(fresh_params(), tcfg))
    print(f"f) two-stage forward only:   {f*1e3:7.1f} ms "
          f"(stage B fwd ~{(f-e)*1e3:.0f})", flush=True)

    # g) two-stage full production step
    core_ts = make_train_step(
        fwd_ts, tcfg, world_size_max=float(max(cfg.world_size)),
        tv_fused=tv_fused,
    )
    g = timeit_state(lambda st, bt: core_ts(st, bt, key)[0],
                     lambda: create_train_state(fresh_params(), tcfg))
    print(f"g) two-stage full step:      {g*1e3:7.1f} ms "
          f"(bwd+opt+tv ~{(g-f)*1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
