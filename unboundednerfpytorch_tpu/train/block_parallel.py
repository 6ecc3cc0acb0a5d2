"""Concurrent block/scene-parallel training — stacked SPMD over a `block`
mesh axis.

The reference trains blocks as *separate sequential processes* (one
`--block_index` run per block, ``/root/reference/train_block_nerf.py:24,103``;
``run_FourierGrid.py:101-103`` + per-block ``fine_last_{i}.tar``). Blocks
never communicate during training and are min-merged afterwards
(``FourierGrid_ckpt_manager.merge_blocks:60-97``) — which requires every
block's grids to share one shape.

The TPU-native equivalent: stack the K blocks' parameters along a leading
axis, shard that axis over a ``block`` mesh axis, and run ONE jitted
vmapped train step — XLA executes all blocks concurrently, each on its own
device slice, zero collectives (blocks are independent, so none are needed).
Per-block ray stores are padded to a common length and sampled within each
block's valid prefix.

Shared world bbox: computed once from ALL training views, exactly the
uniform-shape precondition the reference's elementwise-min merge already
imposes. Scope (v1): the waymo/FourierGrid block recipe — fine stage,
pg_scale supported (a re-stack + re-jit boundary), scalar fast_color_thres.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unboundednerfpytorch_tpu.configs.schema import ExpConfig
from unboundednerfpytorch_tpu.train import bbox as bbox_mod
from unboundednerfpytorch_tpu.train import loop as loop_mod
from unboundednerfpytorch_tpu.train.step import (
    TrainState,
    create_train_state,
    make_train_step,
)


def _stack_trees(trees: list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _unstack_tree(tree, k: int):
    return [jax.tree.map(lambda x: x[i], tree) for i in range(k)]


def partition_views(i_train: np.ndarray, block_num: int) -> list[np.ndarray]:
    """Contiguous view partition (run_FourierGrid.py:101-103 semantics)."""
    per_block = int(np.ceil(len(i_train) / block_num))
    out = []
    for b in range(block_num):
        ids = i_train[b * per_block : (b + 1) * per_block]
        if ids.size:
            out.append(ids)
    return out


def block_mesh(n_blocks: int, devices=None) -> Mesh:
    """1D `block` mesh using the largest device count that divides n_blocks
    (so the stacked leading axis shards evenly)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and n_blocks % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), ("block",))


def _stacked_stores(cfg: ExpConfig, data_dict: dict, blocks) -> tuple[dict, np.ndarray]:
    """Per-block ray stores padded to a common length and stacked [K, R, ...].

    Returns (stacked store, valid-ray counts [K])."""
    stores = []
    for ids in blocks:
        sub = dict(data_dict)
        sub["i_train"] = ids
        stores.append(loop_mod.gather_training_rays(cfg, sub, host=True))
    n_valid = np.asarray([s["rgb"].shape[0] for s in stores])
    r_max = int(n_valid.max())

    def pad(x):
        if x.shape[0] == r_max:
            return x
        reps = np.concatenate([x, np.repeat(x[:1], r_max - x.shape[0], axis=0)])
        return reps

    stacked = {
        k: jnp.asarray(np.stack([pad(np.asarray(s[k])) for s in stores]))
        for k in stores[0]
        if stores[0][k] is not None
    }
    return stacked, n_valid


def run_train_blocks_parallel(
    cfg: ExpConfig,
    data_dict: dict,
    block_num: int,
    exp_dir: str,
    seed: int = 777,
    log_fn=print,
    merge: bool = True,
    devices=None,
    no_reload: bool = False,
    save_every: int = 0,
):
    """Train all blocks concurrently; save fine_last_{b} ckpts + min-merge.

    Semantics match running the same single-block recipe (shared bbox,
    per-block PRNG seed + per-step fold_in) sequentially — verified by
    tests/test_block_parallel.py against a python-loop execution.

    Crash recovery mirrors the reference's implicit per-block resume
    (run_train.py:112-136 applied per block): ``save_every`` periodically
    writes every block's fine_last_{b} (params + Adam moments + step); a
    rerun with the same exp_dir restacks them and continues mid-run instead
    of restarting from step 1."""
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt

    family = loop_mod.model_family_name(cfg)
    xyz_min, xyz_max = bbox_mod.compute_bbox_by_cam_frustrm(
        cfg, data_dict, family
    )
    cfg_model = cfg.fine_model_and_render
    cfg_train = cfg.fine_train

    blocks = partition_views(np.asarray(data_dict["i_train"]), block_num)
    k_blocks = len(blocks)
    log_fn(
        f"block-parallel: {k_blocks} blocks x {len(blocks[0])} views, "
        f"shared bbox {np.round(np.asarray(xyz_min), 3)}..{np.round(np.asarray(xyz_max), 3)}"
    )

    store, n_valid = _stacked_stores(cfg, data_dict, blocks)
    n_valid_j = jnp.asarray(n_valid, jnp.int32)

    start_step = 0
    resume = _load_block_ckpts(exp_dir, k_blocks) if not no_reload else None
    if resume is not None:
        family, mcfg, params_list, start_step, opt_bytes_list = resume
        states = []
        for p, ob in zip(params_list, opt_bytes_list):
            st = create_train_state(p, cfg_train, start_step=start_step)
            if ob is not None:
                st = st.replace(
                    opt_state=jax.tree.map(
                        lambda t, s_: jnp.asarray(s_, t.dtype),
                        st.opt_state,
                        ckpt.restore_opt_state(ob, st.opt_state),
                    )
                )
            states.append(st)
        state = _stack_trees(states)
        log_fn(f"block-parallel: resumed {k_blocks} blocks at step {start_step}")
    else:
        # per-block init (distinct seeds, like run_train_blocks' seed + b)
        inits = [
            loop_mod.build_model(
                cfg, cfg_model, cfg_train, xyz_min, xyz_max,
                jax.random.PRNGKey(seed + b),
                # one shared table size (stacked params must line up across
                # blocks); per-block img_index < len(blocks[b]) <= max
                n_train=max(len(bv) for bv in blocks),
            )
            for b in range(k_blocks)
        ]
        family = inits[0][0]
        mcfg = inits[0][1]
        state = _stack_trees(
            [create_train_state(p, cfg_train) for _, _, p in inits]
        )

    mesh = block_mesh(k_blocks, devices)
    shard = NamedSharding(mesh, P("block"))
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, shard), state)
    store = {k: jax.device_put(v, shard) for k, v in store.items()}

    render_kwargs = {
        "near": float(data_dict["near"]),
        "far": float(data_dict["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "rand_bkgd": cfg.data.rand_bkgd,
        "stepsize": cfg_model.stepsize,
    }
    n_rand = cfg_train.N_rand

    # lr-decay semantics mirror loop.py: decay re-anchors to the base lr at
    # every pg boundary (run_train.py:199), and FourierGrid-on-tankstemple
    # never decays (run_train.py:292)
    lr_decay_enabled = not (
        cfg.model == "FourierGrid" and cfg.data.dataset_type == "tankstemple"
    )
    lr_anchor = max([1] + [int(b) for b in cfg_train.pg_scale
                           if int(b) <= start_step])

    def compile_vstep(mcfg, lr_anchor_now):
        fwd = loop_mod.make_forward(family, mcfg, render_kwargs)
        step1 = make_train_step(
            fwd, cfg_train,
            world_size_max=float(max(mcfg.world_size)),
            lr_anchor=lr_anchor_now, lr_decay_enabled=lr_decay_enabled,
        )

        def one_block(state, store_b, nvalid_b, key):
            k_idx, k_step = jax.random.split(key)
            idx = jax.random.randint(k_idx, (n_rand,), 0, nvalid_b)
            batch = {k: v[idx] for k, v in store_b.items()}
            return step1(state, batch, k_step)

        vstep = jax.vmap(one_block)
        return jax.jit(vstep, donate_argnums=(0,))

    # training-time sample budget deferred until the first occupancy refresh,
    # exactly like the sequential recipe (loop.py deferred_budget): the cache
    # is all-True at init, so the fixed-budget compaction would arbitrarily
    # truncate each ray's far samples and starve distant geometry.
    deferred_budget = 0
    if (getattr(mcfg, "sample_budget", 0) > 0 and cfg_train.pg_scale
            and start_step < min(cfg_train.pg_scale)):
        deferred_budget = mcfg.sample_budget
        mcfg = dataclasses.replace(mcfg, sample_budget=0)

    vstep = compile_vstep(mcfg, lr_anchor)
    base_key = jax.random.PRNGKey(seed)

    pg_steps = set(int(s) for s in (cfg_train.pg_scale or ()))
    num_vox_d, num_vox_r = mcfg.num_voxels_density, mcfg.num_voxels_rgb

    def save_blocks(step_now: int, opt_state=None) -> list[str]:
        params_list = _unstack_tree(jax.device_get(state.params), k_blocks)
        opt_list = (
            _unstack_tree(jax.device_get(state.opt_state), k_blocks)
            if opt_state is not None else [None] * k_blocks
        )
        # never persist a deferral-zeroed sample_budget: a resumed run would
        # otherwise see budget 0 in the reloaded mcfg, skip the deferral
        # bookkeeping, and train budget-less forever (loop.py _save_mcfg)
        save_mcfg = (
            dataclasses.replace(mcfg, sample_budget=deferred_budget)
            if deferred_budget else mcfg
        )
        paths = []
        for b, (p, o) in enumerate(zip(params_list, opt_list)):
            path = os.path.join(exp_dir, f"fine_last_{b}")
            ckpt.save_model(
                path, family, save_mcfg, p, global_step=step_now, opt_state=o
            )
            paths.append(path)
        return paths

    for step in range(1 + start_step, cfg_train.N_iters + 1):
        if step in pg_steps:
            # re-stack boundary: per-block progressive upsampling, act_shift
            # decay, deferred-budget enable + fresh optimizer
            # (run_train.py:187-201 / loop.py pg boundary), then re-jit
            num_vox_d *= 2
            num_vox_r *= 2
            params_list = _unstack_tree(state.params, k_blocks)
            new_list = []
            for p in params_list:
                p2, mcfg = _scale_block(family, p, mcfg, num_vox_d, num_vox_r)
                p2 = p2.replace(
                    act_shift=p2.act_shift - cfg_train.decay_after_scale
                )
                new_list.append(p2)
            if deferred_budget:
                # occupancy just refreshed from trained density inside
                # scale_volume_grid -> the budget compaction is now safe
                mcfg = dataclasses.replace(mcfg, sample_budget=deferred_budget)
                deferred_budget = 0
            state = _stack_trees(
                [
                    create_train_state(p, cfg_train, start_step=step - 1)
                    for p in new_list
                ]
            )
            state = jax.tree.map(lambda x: jax.device_put(x, shard), state)
            lr_anchor = step
            vstep = compile_vstep(mcfg, lr_anchor)
            log_fn(f"block-parallel: pg_scale at {step} -> {mcfg.world_size}")

        k_step = jax.random.fold_in(base_key, step)
        keys = jax.random.split(k_step, k_blocks)
        state, metrics = vstep(state, store, n_valid_j, keys)
        if step % 500 == 0 or step == cfg_train.N_iters:
            psnrs = np.asarray(metrics["psnr"])
            log_fn(
                f"block-parallel step {step}: psnr "
                + " ".join(f"{v:.2f}" for v in psnrs)
            )
        if save_every and step % save_every == 0 and step < cfg_train.N_iters:
            save_blocks(step, opt_state=state.opt_state)

    # save per-block ckpts (incl. Adam moments, like the reference's
    # optimizer_state_dict in fine_last.tar) + min-merge
    paths = save_blocks(cfg_train.N_iters, opt_state=state.opt_state)
    if merge and len(paths) > 1:
        merged = os.path.join(exp_dir, "fine_last_merged")
        ckpt.merge_blocks(paths, merged)
        log_fn(f"block-parallel: merged {len(paths)} blocks -> {merged}")
    return paths


def _load_block_ckpts(exp_dir: str, k_blocks: int):
    """Restack mid-run per-block checkpoints for implicit resume. Returns
    (family, mcfg, params_list, step, opt_bytes_list) when every block has a
    checkpoint at a common non-final step, else None."""
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt

    loaded = []
    for b in range(k_blocks):
        path = os.path.join(exp_dir, f"fine_last_{b}")
        if not os.path.exists(os.path.join(path, "meta.json")):
            return None
        loaded.append(ckpt.load_model(path))
    steps = {int(l[3]) for l in loaded}
    if len(steps) != 1 or steps == {0}:
        # blocks out of sync (crash mid-save) or final saves without a step:
        # safer to restart than to resume from mixed states
        return None
    family, mcfg = loaded[0][0], loaded[0][1]
    return (
        family, mcfg,
        [l[2] for l in loaded],
        int(steps.pop()),
        [l[4] for l in loaded],
    )


def _scale_block(family: str, params, mcfg, num_vox_d: int, num_vox_r: int):
    if family == "FourierGrid":
        from unboundednerfpytorch_tpu.models import fourier_grid as fg

        return fg.scale_volume_grid(params, mcfg, num_vox_d, num_vox_r)
    if family == "dvgo":
        from unboundednerfpytorch_tpu.models import dvgo as dv

        return dv.scale_volume_grid(params, mcfg, num_vox_r)
    raise NotImplementedError(family)
