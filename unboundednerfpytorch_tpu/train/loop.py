"""Training orchestration (L6): the coarse→fine recipe.

Re-implements ``scene_rep_reconstruction`` / ``run_train``
(``/root/reference/FourierGrid/run_train.py:98-398``) around the single
jitted step: model factory dispatch, ray-store precompute, progressive
pg_scale upsampling (a re-jit boundary: grids are resized, the optimizer is
rebuilt, act_shift is decayed), per-voxel lr init, periodic logging, and
checkpoint save.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.configs.schema import ExpConfig, ModelRenderConfig, TrainStageConfig
from unboundednerfpytorch_tpu.models import dvgo
from unboundednerfpytorch_tpu.ops import rays as ray_ops
from unboundednerfpytorch_tpu.train import bbox as bbox_mod
from unboundednerfpytorch_tpu.train.step import (
    TrainState,
    create_train_state,
    make_sampled_step,
    make_train_step,
)


def build_model(
    cfg: ExpConfig,
    cfg_model: ModelRenderConfig,
    cfg_train: TrainStageConfig,
    xyz_min,
    xyz_max,
    key: jax.Array,
    n_train: int = -1,
):
    """Model factory dispatch (run_train.py:19-55). pg_scale shrinks the
    initial voxel count by 4^-... i.e. /2^len(pg_scale) per reference.

    n_train: number of training views — sizes the per-image appearance
    embedding table when cfg_model.img_emb_dim > 0 (the reference threads
    args.sample_num into the model, run_train.py:28; batches carry img_index
    = position within i_train, so the table is indexed by that)."""
    num_voxels_density = cfg_model.num_voxels_density
    num_voxels_rgb = cfg_model.num_voxels_rgb
    if cfg_train.pg_scale:
        num_voxels_density = int(num_voxels_density / (2 ** len(cfg_train.pg_scale)))
        num_voxels_rgb = int(num_voxels_rgb / (2 ** len(cfg_train.pg_scale)))

    name = model_family_name(cfg)
    if name == "FourierGrid":
        from unboundednerfpytorch_tpu.models import fourier_grid as fg

        mcfg = fg.config_from(cfg_model, xyz_min, xyz_max,
                              num_voxels_density, num_voxels_rgb,
                              sample_num=n_train)
        params = fg.create(mcfg, key)
        return "FourierGrid", mcfg, params
    if name == "dmpigo":
        from unboundednerfpytorch_tpu.models import dmpigo

        mcfg = dmpigo.config_from(cfg_model, xyz_min, xyz_max, num_voxels_rgb)
        params = dmpigo.create(mcfg, key)
        return "dmpigo", mcfg, params
    if name == "dcvgo":
        from unboundednerfpytorch_tpu.models import dcvgo

        mcfg = dcvgo.config_from(cfg_model, xyz_min, xyz_max, num_voxels_rgb)
        params = dcvgo.create(mcfg, key)
        return "dcvgo", mcfg, params

    mcfg = dvgo.DVGOConfig(
        xyz_min=tuple(float(v) for v in xyz_min),
        xyz_max=tuple(float(v) for v in xyz_max),
        num_voxels=num_voxels_rgb,
        num_voxels_base=cfg_model.num_voxels_base_rgb,
        alpha_init=cfg_model.alpha_init,
        fast_color_thres=__import__(
            "unboundednerfpytorch_tpu.configs.schema", fromlist=["x"]
        ).normalize_fast_color_thres(cfg_model)[0],
        density_type=cfg_model.density_type,
        k0_type=cfg_model.k0_type,
        density_config=cfg_model.density_config,
        k0_config=cfg_model.k0_config,
        rgbnet_dim=cfg_model.rgbnet_dim,
        rgbnet_direct=cfg_model.rgbnet_direct,
        rgbnet_full_implicit=cfg_model.rgbnet_full_implicit,
        rgbnet_depth=cfg_model.rgbnet_depth,
        rgbnet_width=cfg_model.rgbnet_width,
        mask_cache_thres=cfg_model.mask_cache_thres,
    )
    params = dvgo.create(mcfg, key)
    return "dvgo", mcfg, params


def model_family_name(cfg: ExpConfig) -> str:
    """Dispatch rule of run_train.py:29-51."""
    if cfg.data.dataset_type in ("waymo", "mega", "nerfpp") or cfg.model == "FourierGrid":
        return "FourierGrid"
    if cfg.data.ndc:
        return "dmpigo"
    if cfg.data.unbounded_inward:
        return "dcvgo"
    return "dvgo"


def gather_training_rays(cfg: ExpConfig, data_dict: dict, host: bool = False) -> dict:
    """Precompute the flattened ray store (dvgo.py:595-627).

    host=True (the ``load2gpu_on_the_fly`` mode, run_train.py:242-248):
    rays are generated one view at a time and accumulated in host RAM, so
    the store is bounded by host memory, not HBM — required for Waymo-scale
    scenes (hundreds of 1216x912 views)."""
    i_train = np.asarray(data_dict["i_train"])
    HW = np.asarray(data_dict["HW"])
    H, W = int(HW[i_train[0]][0]), int(HW[i_train[0]][1])
    assert (HW[i_train] == (H, W)).all(), (
        "mixed per-view image sizes in one training stage are unsupported "
        "(the flattened ray store assumes H*W rays per view)"
    )
    # per-view intrinsics: multi-camera rigs (waymo sample_cam=None) carry a
    # different K per view — the reference passes Ks[i_train] (run_train.py:75)
    Ks_np = np.asarray(data_dict["Ks"])[i_train]
    poses_np = np.asarray(data_dict["poses"])[i_train][:, :3, :4]
    images_np = np.asarray(data_dict["images"])[i_train]

    if host:
        ro_l, rd_l, vd_l = [], [], []
        for c2w, K_i in zip(poses_np, Ks_np):
            ro, rd, vd = ray_ops.get_rays_of_a_view(
                H, W, jnp.asarray(K_i), jnp.asarray(c2w),
                ndc=cfg.data.ndc, inverse_y=cfg.data.inverse_y,
                flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
            )
            ro_l.append(np.asarray(ro).reshape(-1, 3))
            rd_l.append(np.asarray(rd).reshape(-1, 3))
            vd_l.append(np.asarray(vd).reshape(-1, 3))
        n_img = len(poses_np)
        return {
            "rgb": images_np.reshape(-1, 3).astype(np.float32),
            "rays_o": np.concatenate(ro_l),
            "rays_d": np.concatenate(rd_l),
            "viewdirs": np.concatenate(vd_l),
            "img_index": np.repeat(np.arange(n_img, dtype=np.int32), H * W),
        }

    rgb, rays_o, rays_d, viewdirs, img_index = ray_ops.get_training_rays_flatten(
        jnp.asarray(images_np), jnp.asarray(poses_np), H, W, jnp.asarray(Ks_np),
        ndc=cfg.data.ndc, inverse_y=cfg.data.inverse_y,
        flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
    )
    return {
        "rgb": rgb,
        "rays_o": rays_o,
        "rays_d": rays_d,
        "viewdirs": viewdirs,
        "img_index": img_index,
    }


def make_forward(family: str, mcfg, render_kwargs: dict, cache=None) -> Callable:
    """Close the model family's forward over static config + render kwargs,
    exposing the uniform (params, ro, rd, vd, key, img_index, cache=...)
    signature used by the train step. ``cache`` (FourierGrid only) is a
    pre-packed RenderCache for the packed gather engine — pass it for
    rendering with frozen params; training packs on the fly inside the
    step. Callers that jit should thread BOTH params and cache through as
    arguments (the per-call ``cache=`` kwarg), never as closure constants —
    captured multi-GB tables bake into the executable (renderer.py)."""
    if family == "dvgo":

        def fwd(params, ro, rd, vd, key, img_index=None, cache=cache):
            return dvgo.forward(
                params, mcfg, ro, rd, vd,
                near=render_kwargs["near"],
                stepsize=render_kwargs["stepsize"],
                bg=render_kwargs["bg"],
                cache=cache,
            )

        return fwd
    if family == "FourierGrid":
        from unboundednerfpytorch_tpu.models import fourier_grid as fg

        def fwd(params, ro, rd, vd, key, img_index=None, cache=cache):
            return fg.forward(
                params, mcfg, ro, rd, vd,
                stepsize=render_kwargs["stepsize"],
                rand_bkgd_key=key if render_kwargs.get("rand_bkgd") else None,
                img_index=img_index,
                cache=cache,
                spatial_mesh=render_kwargs.get("spatial_mesh"),
            )

        return fwd
    if family == "dcvgo":
        from unboundednerfpytorch_tpu.models import dcvgo

        def fwd(params, ro, rd, vd, key, img_index=None, cache=cache):
            # rand_bkgd is train-time only in the reference (dcvgo.py:350
            # gates on is_train) — render paths omit it from render_kwargs
            return dcvgo.forward(
                params, mcfg, ro, rd, vd,
                near=render_kwargs["near"],
                stepsize=render_kwargs["stepsize"],
                bg=render_kwargs["bg"],
                rand_bkgd_key=key if render_kwargs.get("rand_bkgd") else None,
                cache=cache,
            )

        return fwd
    if family == "dmpigo":
        from unboundednerfpytorch_tpu.models import dmpigo

        def fwd(params, ro, rd, vd, key, img_index=None, cache=cache):
            # rand_bkgd is train-time only (dmpigo.py:315 gates on
            # global_step) — render paths omit it from render_kwargs
            return dmpigo.forward(
                params, mcfg, ro, rd, vd,
                stepsize=render_kwargs["stepsize"],
                bg=render_kwargs["bg"],
                rand_bkgd_key=key if render_kwargs.get("rand_bkgd") else None,
                cache=cache,
            )

        return fwd
    raise NotImplementedError(family)


def scale_model(family: str, params, mcfg, num_voxels_density, num_voxels_rgb):
    if family == "dvgo":
        return dvgo.scale_volume_grid(params, mcfg, num_voxels_rgb)
    if family == "FourierGrid":
        from unboundednerfpytorch_tpu.models import fourier_grid as fg

        return fg.scale_volume_grid(params, mcfg, num_voxels_density, num_voxels_rgb)
    if family == "dcvgo":
        from unboundednerfpytorch_tpu.models import dcvgo

        return dcvgo.scale_volume_grid(params, mcfg, num_voxels_rgb)
    if family == "dmpigo":
        from unboundednerfpytorch_tpu.models import dmpigo

        return dmpigo.scale_volume_grid(params, mcfg, num_voxels_rgb)
    raise NotImplementedError(family)


def scene_rep_reconstruction(
    cfg: ExpConfig,
    cfg_model: ModelRenderConfig,
    cfg_train: TrainStageConfig,
    xyz_min,
    xyz_max,
    data_dict: dict,
    stage: str,
    seed: int = 777,
    log_every: int = 500,
    log_fn: Callable[[str], None] = print,
    callback: Callable[[int, dict], None] | None = None,
    exp_dir: str | None = None,
    no_reload: bool = False,
    no_reload_optimizer: bool = False,
    save_every: int = 0,
    coarse_mask_fn=None,
    use_mesh: bool | None = None,
    grid_parallel: int = 1,
    ft_path: str = "",
):
    """One training stage; returns (family, model config, trained params, psnr).

    ``use_mesh``: ray/batch data-parallelism over all visible chips (the
    NCCL-DDP replacement, SURVEY.md §2.3) — params replicated, the per-step
    ray batch sharded over a `data` mesh axis, gradient psum inserted by XLA
    over ICI. None = auto (on when >1 device and N_rand divides evenly);
    False forces single-device execution. Multi-process runs additionally
    assemble the global batch from per-host view-shard stores
    (parallel.mesh.make_global_batch), so the DP step is well-defined across
    hosts.

    ``grid_parallel``: shard the voxel grids (and their Adam moments)
    spatially over a `grid` mesh axis of this size — the >HBM case
    (SURVEY.md §7.3: 320^3 x 7-bank grids exceed one chip). Field queries
    route through the halo-exchange sampler (parallel/halo.py); rays stay
    data-parallel over the remaining devices."""
    # world_bound_scale bbox inflation (run_train.py:100-104)
    xyz_min = np.asarray(xyz_min, np.float64)
    xyz_max = np.asarray(xyz_max, np.float64)
    if abs(cfg_model.world_bound_scale - 1) > 1e-9:
        shift = (xyz_max - xyz_min) * (cfg_model.world_bound_scale - 1) / 2
        xyz_min = xyz_min - shift
        xyz_max = xyz_max + shift

    key = jax.random.PRNGKey(seed)
    key, k_model = jax.random.split(key)

    # implicit resume: a crashed run restarted with the same expname picks up
    # the stage's last checkpoint (run_train.py:112-136)
    start_step = 0
    reload_path = None
    if exp_dir:
        import os

        os.makedirs(exp_dir, exist_ok=True)
    if ft_path and not no_reload:
        # explicit fine-tune checkpoint wins over the implicit stage-last
        # (run_train.py:115-117)
        reload_path = ft_path
    elif exp_dir and not no_reload:
        import os

        cand = os.path.join(exp_dir, f"{stage}_last")
        if os.path.exists(os.path.join(cand, "meta.json")):
            reload_path = cand
    opt_bytes = None
    if reload_path is not None:
        from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

        family, mcfg, params, start_step, opt_bytes = ckpt_mod.load_model(reload_path)
        if str(reload_path).endswith(".tar"):
            # fine-tuning FROM a reference checkpoint: reference ckpts carry
            # no render/train-time knobs — this config's values must win
            from unboundednerfpytorch_tpu.utils.reference_import import (
                overlay_render_knobs,
            )

            mcfg = overlay_render_knobs(mcfg, cfg_model)
        if no_reload_optimizer:
            opt_bytes = None  # --no_reload_optimizer (run_FourierGrid.py:36-37)
        log_fn(f"{stage}: resumed from {reload_path} at step {start_step}")
    if jax.process_count() > 1:
        # checkpoints are written by process 0 only; on a host-local exp_dir
        # the other processes would resume at step 0 and silently diverge
        # (then deadlock when process 0 finishes its shorter loop) — fail
        # fast instead and require a shared filesystem
        from jax.experimental import multihost_utils

        steps_all = multihost_utils.process_allgather(
            np.asarray(start_step, np.int32)
        )
        if int(steps_all.min()) != int(steps_all.max()):
            raise RuntimeError(
                f"implicit-resume start_step differs across processes "
                f"({steps_all.tolist()}): exp_dir must live on a filesystem "
                f"shared by all hosts (process 0 writes the checkpoints). "
                f"Mount a shared exp_dir or rerun with --no_reload."
            )
    if reload_path is None:
        family, mcfg, params = build_model(
            cfg, cfg_model, cfg_train, xyz_min, xyz_max, k_model,
            n_train=len(np.asarray(data_dict["i_train"])),
        )
        if coarse_mask_fn is not None and hasattr(params, "mask_cache"):
            mask = coarse_mask_fn(
                params.mask_cache.mask.shape, mcfg.xyz_min, mcfg.xyz_max
            )
            params = params.replace(
                mask_cache=params.mask_cache.replace(mask=mask)
            )

    # the reference applies this to every model that defines it — dvgo AND
    # FourierGrid (run_train.py:129-130 dispatches on the model object)
    if cfg_model.maskout_near_cam_vox and start_step == 0 and family in (
        "dvgo", "FourierGrid",
    ):
        cam_o = jnp.asarray(
            np.asarray(data_dict["poses"])[np.asarray(data_dict["i_train"])][:, :3, 3]
        )
        from unboundednerfpytorch_tpu.models import fourier_grid as fg

        mask_fn = (
            dvgo.maskout_near_cam_vox if family == "dvgo"
            else fg.maskout_near_cam_vox
        )
        params = mask_fn(params, mcfg, cam_o, data_dict["near"])

    render_kwargs = {
        "near": float(data_dict["near"]),
        "far": float(data_dict["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "rand_bkgd": cfg.data.rand_bkgd,
        "stepsize": cfg_model.stepsize,
    }

    # periodic held-out eval panels (VERDICT r4 #8): render the first test
    # view through the CURRENT model at the i_panel cadence and write
    # [GT|pred|err|depth] PNGs + a panels.jsonl psnr series. The render fn
    # re-jits lazily per pg stage (mcfg identity changes at boundaries).
    i_panel = int(getattr(cfg_train, "i_panel", 0))
    _panel_cache: dict = {}

    def _write_eval_panel(mcfg_now, params_now, step_now):
        from unboundednerfpytorch_tpu.render import renderer as _renderer
        from unboundednerfpytorch_tpu.utils import observability as _obs

        i_test = np.asarray(data_dict["i_test"]).reshape(-1)
        if i_test.size == 0:
            return
        view = int(i_test[0])
        if _panel_cache.get("mcfg") is not mcfg_now:
            eval_mcfg = mcfg_now
            if getattr(eval_mcfg, "train_survivor_budget", 0):
                eval_mcfg = dataclasses.replace(
                    eval_mcfg, train_survivor_budget=0
                )
            eval_kwargs = {
                k: v for k, v in render_kwargs.items() if k != "rand_bkgd"
            }
            _panel_cache["fwd"] = make_forward(family, eval_mcfg, eval_kwargs)
            _panel_cache["mcfg"] = mcfg_now
        Hp, Wp = (int(v) for v in np.asarray(data_dict["HW"])[view])
        rgb, depth, bgmap = _renderer.render_image(
            lambda aux, ro, rd, vd: _panel_cache["fwd"](aux, ro, rd, vd, None),
            Hp, Wp, np.asarray(data_dict["Ks"])[view],
            np.asarray(data_dict["poses"])[view][:3, :4],
            aux=params_now,
        )
        view_psnr = _obs.record_panel(
            exp_dir, stage, step_now, np.asarray(data_dict["images"][view]),
            rgb, depth, bgmap,
        )
        log_fn(f"{stage} panel @ {step_now}: view {view} psnr {view_psnr:.2f}")

    use_host_store = cfg.data.load2gpu_on_the_fly

    # ray/batch data parallelism (auto when >1 chip is visible)
    from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod

    n_dev = len(jax.devices())
    auto_mesh = use_mesh if use_mesh is not None else n_dev > 1
    mesh = None
    if grid_parallel > 1:
        assert n_dev % grid_parallel == 0, (n_dev, grid_parallel)
        assert cfg_train.N_rand % (n_dev // grid_parallel) == 0, (
            cfg_train.N_rand, n_dev, grid_parallel)
        mesh = mesh_mod.make_mesh(grid_parallel=grid_parallel)
        render_kwargs["spatial_mesh"] = mesh
        log_fn(
            f"{stage}: 2D mesh {dict(mesh.shape)} — grids sharded spatially "
            "(halo-exchange sampling), rays data-parallel"
        )
    elif auto_mesh and n_dev > 1:
        if cfg_train.N_rand % n_dev == 0:
            mesh = mesh_mod.make_mesh()
            log_fn(f"{stage}: DP over {n_dev} devices (mesh axis 'data')")
        else:
            log_fn(
                f"{stage}: N_rand={cfg_train.N_rand} not divisible by "
                f"{n_dev} devices — training single-device"
            )

    # multi-host input pipeline (SURVEY.md §7.3): each host stores only its
    # deterministic view shard and draws its share of the global ray batch
    # host-side; the global batch array is assembled per step
    # (make_global_batch). Identity on single-process runs.
    n_rand_local = cfg_train.N_rand
    if jax.process_count() > 1:
        import unboundednerfpytorch_tpu.train.step as step_mod_

        assert mesh is not None, (
            "multi-process training requires the DP mesh "
            f"(N_rand={cfg_train.N_rand} must divide {n_dev} global devices)"
        )
        data_dict = dict(data_dict)
        data_dict["i_train"] = step_mod_.shard_views_for_host(
            data_dict["i_train"]
        )
        n_rand_local = step_mod_.per_host_batch_size(cfg_train.N_rand)
        use_host_store = True  # global-batch assembly is host-side
    store = gather_training_rays(cfg, data_dict, host=use_host_store)

    # 'in_maskcache' ray filter (dvgo.get_training_rays_in_maskcache_sampling):
    # drop rays that never hit the coarse occupancy — host-side boolean
    # filtering on the precomputed store (one-time, outside jit).
    if cfg_train.ray_sampler == "in_maskcache" and family == "dvgo":
        hit_fn = jax.jit(
            lambda ro, rd: dvgo.hit_coarse_geo(
                params, mcfg, ro, rd,
                near=render_kwargs["near"], stepsize=render_kwargs["stepsize"],
            )
        )
        chunks = []
        n_total = store["rays_o"].shape[0]
        for i in range(0, n_total, 65536):
            chunks.append(np.asarray(hit_fn(
                store["rays_o"][i : i + 65536], store["rays_d"][i : i + 65536]
            )))
        hit = np.concatenate(chunks)
        if hit.any() and not hit.all():
            idx = np.nonzero(hit)[0]
            store = {k: v[idx] for k, v in store.items()}

    state = create_train_state(params, cfg_train, start_step=start_step)
    if opt_bytes is not None:
        # restore Adam moments so an interrupted run continues the same
        # trajectory (run_train.py:313-331 optimizer_state_dict reload)
        from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

        restored = ckpt_mod.restore_opt_state(opt_bytes, state.opt_state)
        # cast to the template dtypes (older checkpoints may hold bf16
        # moments; the optimizer keeps >=f32 moments)
        state = state.replace(
            opt_state=jax.tree.map(
                lambda t, s_: jnp.asarray(s_, t.dtype), state.opt_state,
                restored,
            )
        )

    # per-voxel learning rate from view counts (run_train.py:169-180)
    if (cfg_train.pervoxel_lr and family == "dvgo"
            and cfg_train.ray_sampler != "in_maskcache"):
        n_img = len(np.asarray(data_dict["i_train"]))
        H, W = (int(v) for v in np.asarray(data_dict["HW"])[0])
        rays_o_v = store["rays_o"].reshape(n_img, H * W, 3)
        rays_d_v = store["rays_d"].reshape(n_img, H * W, 3)
        down = max(1, cfg_train.pervoxel_lr_downrate)
        count = dvgo.voxel_count_views(
            params, mcfg, rays_o_v[:, ::down], rays_d_v[:, ::down],
            near=render_kwargs["near"], stepsize=render_kwargs["stepsize"],
        )
        from unboundednerfpytorch_tpu.optim import factory as opt_factory
        from unboundednerfpytorch_tpu.optim.masked_adam import make_per_lr

        per_lr_grid = count / jnp.maximum(count.max(), 1.0)
        trainable0, _ = opt_factory.split_trainable(state.params, cfg_train)
        per_lr = make_per_lr(
            trainable0, {"density": params.density.replace(grid=per_lr_grid)}
        )
        state = state.replace(per_lr=per_lr)
        # voxels seen by <=2 views are masked out (run_train.py:177-180)
        new_mask = params.mask_cache.mask & (count[..., 0] > 2)
        params = params.replace(
            mask_cache=params.mask_cache.replace(mask=new_mask)
        )
        state = state.replace(params=params)

    # near-clip loss threshold (run_train.py:262-268): contracted units
    near_thres = 0.0
    if cfg_train.weight_nearclip > 0 and data_dict.get("near_clip"):
        radius = getattr(mcfg, "scene_radius", None)
        if radius is not None:
            near_thres = float(data_dict["near_clip"]) / float(radius[0])

    # sampler selection (run_train.py:204-248): 'flatten'/'in_maskcache' use
    # epoch-permutation semantics; 'random' is with-replacement. With
    # load2gpu_on_the_fly the store stays in host RAM and batches are sliced
    # host-side, else the sampler is fused into the jitted step.
    def place(tree):
        """Commit a pytree to the mesh: replicated, except the voxel grids
        (and their Adam moments) when grid_parallel > 1 — those shard their
        leading spatial axis over the `grid` mesh axis."""
        if mesh is None:
            return tree
        if grid_parallel > 1:
            return mesh_mod.shard_params(mesh, tree, shard_grids=True)
        return jax.device_put(tree, mesh_mod.replicated(mesh))

    state = place(state)

    flatten = cfg_train.ray_sampler in ("flatten", "in_maskcache")
    host_sampler = None
    samp_holder: dict = {}
    if use_host_store:
        from unboundednerfpytorch_tpu.train import step as step_mod

        # per-process seed: each host draws an independent share of the
        # global batch from its local view-shard store (identical to `seed`
        # on single-process runs, where process_index() == 0)
        host_sampler = step_mod.HostRayStoreSampler(
            store, n_rand_local, seed=seed + jax.process_index(),
            mode="flatten" if flatten else "random",
        )
        if start_step > 0:
            # replay the RNG stream so a resumed run draws the same batches
            # as the uninterrupted run would at steps > start_step
            host_sampler.fast_forward(start_step)
    elif flatten:
        from unboundednerfpytorch_tpu.train import step as step_mod

        store = place(store)
        n_total = int(store["rgb"].shape[0])
        if start_step > 0:
            # reconstruct the epoch-permutation state at start_step: the
            # reshuffle schedule is deterministic (cursor arithmetic) and
            # each reshuffle keys off fold_in(key, step), so resume
            # continues the exact batch stream of the uninterrupted run
            perm_key = jax.random.fold_in(key, 2**31 - 1)
            cursor = 0
            for s in range(1, start_step + 1):
                if cursor + cfg_train.N_rand > n_total:
                    perm_key = jax.random.split(jax.random.fold_in(key, s))[0]
                    cursor = 0
                cursor += cfg_train.N_rand
            samp_holder["samp"] = place(step_mod.SamplerState(
                perm=jax.random.permutation(perm_key, n_total).astype(jnp.int32),
                cursor=jnp.asarray(cursor, jnp.int32),
            ))
        else:
            samp_holder["samp"] = place(step_mod.init_sampler_state(
                n_total, jax.random.fold_in(key, 2**31 - 1)
            ))
    else:
        store = place(store)

    # the reference never decays the lr for FourierGrid on the bounded
    # tankstemple dataset (run_train.py:292: decay unless model=='FourierGrid'
    # and dataset_type=='tankstemple')
    lr_decay_enabled = not (
        cfg.model == "FourierGrid" and cfg.data.dataset_type == "tankstemple"
    )
    # lr-decay anchor: the reference decays AFTER each update and rebuilds
    # the optimizer at full base lr at every pg_scale boundary
    # (run_train.py:199,292-296); resume reconstructs the uninterrupted
    # anchor (the last boundary at or before start_step)
    lr_anchor = max([1] + [int(b) for b in cfg_train.pg_scale
                           if int(b) <= start_step])

    def compile_step(mcfg_now, lr_anchor_now):
        fwd = make_forward(family, mcfg_now, render_kwargs)
        ws_max = float(max(mcfg_now.world_size))
        tv_axis_scale = None
        if family == "dmpigo":
            # dmpigo scales xy by plane resolution and z by mpi_depth
            # (dmpigo.py:210-217)
            ws = mcfg_now.world_size
            wxy = float(max(ws[:2])) / 128.0
            tv_axis_scale = (wxy, wxy, float(mcfg_now.mpi_depth) / 128.0)
        # fused TV injection on TPU (ops/pallas/tv.py): one HBM pass vs the
        # ~17-pass XLA shift expression. Spatially-sharded grids keep the
        # XLA path (its shifts partition over the `grid` axis; the kernel
        # would need an explicit halo).
        tv_fused = None
        if jax.default_backend() == "tpu" and grid_parallel == 1:
            from unboundednerfpytorch_tpu.ops.pallas import tv as ptv

            tv_fused = ptv.make_tv_fused(mesh=mesh)
        core = make_train_step(
            fwd, cfg_train, world_size_max=ws_max, near_thres=near_thres,
            tv_axis_scale=tv_axis_scale, tv_fused=tv_fused,
            lr_anchor=lr_anchor_now, lr_decay_enabled=lr_decay_enabled,
        )
        if use_host_store:
            jitted = jax.jit(core, donate_argnums=(0,))

            if mesh is not None:

                def run(state, k_step):
                    batch = mesh_mod.make_global_batch(
                        mesh, host_sampler.next_batch()
                    )
                    return jitted(state, batch, k_step)

            else:

                def run(state, k_step):
                    return jitted(state, host_sampler.next_batch(), k_step)

            return run
        if flatten:
            from unboundednerfpytorch_tpu.train import step as step_mod

            fstep = step_mod.make_flatten_sampled_step(
                core, cfg_train.N_rand, mesh=mesh
            )

            def run(state, k_step):
                new_state, samp_holder["samp"], metrics = fstep(
                    state, samp_holder["samp"], store, k_step
                )
                return new_state, metrics

            return run
        sstep = make_sampled_step(core, cfg_train.N_rand, mesh=mesh)
        return lambda state, k_step: sstep(state, store, k_step)

    step_fn = compile_step(mcfg, lr_anchor)

    psnr_hist: list[float] = []
    last_psnr = 0.0
    t0 = time.time()
    n_iters = cfg_train.N_iters
    pg_scale = list(cfg_train.pg_scale)
    # step-keyed fast_color_thres schedule (FourierGrid_model.py:561-564):
    # a threshold change alters the static config -> re-jit boundary.
    from unboundednerfpytorch_tpu.configs.schema import normalize_fast_color_thres

    thres_schedule = dict(normalize_fast_color_thres(cfg_model)[1])

    # training-time sample budget: the occupancy cache is all-True at init
    # (budget would truncate every ray to its first `budget` samples), so hold
    # the budget at 0 until the cache holds trained geometry: either a coarse
    #-stage seed (coarse_mask_fn) or the first pg_scale occupancy refresh.
    # With an empty pg_scale and no coarse seed the cache is NEVER refreshed,
    # so the budget stays off for the whole stage (correctness over speed).
    deferred_budget = 0
    if getattr(mcfg, "sample_budget", 0) > 0:
        first_pg = min(cfg_train.pg_scale) if cfg_train.pg_scale else None
        cache_trusted = coarse_mask_fn is not None or (
            # resuming past the first pg boundary: the occupancy cache was
            # already refreshed in the interrupted run
            first_pg is not None and start_step >= first_pg
        )
        if not cache_trusted:
            deferred_budget = mcfg.sample_budget
            mcfg = dataclasses.replace(mcfg, sample_budget=0)

    # two-stage TRAINING forward: defer until the LAST pg boundary — before
    # the final resolution the density has not polarized, so the thres
    # schedule keeps more than the survivor budget alive per ray and the
    # compaction would truncate real content (measured on the full-recipe
    # smoke: -1.1 dB trajectory drift when enabled early). After the last
    # boundary the grids are final-resolution, density sharpens under the
    # 1e-4 threshold, and the budget holds (metrics expose overflow_frac).
    deferred_ts_budget = 0
    if getattr(mcfg, "train_survivor_budget", 0) > 0:
        last_pg = max(cfg_train.pg_scale) if cfg_train.pg_scale else 0
        if start_step < last_pg:
            deferred_ts_budget = mcfg.train_survivor_budget
            mcfg = dataclasses.replace(mcfg, train_survivor_budget=0)

    for global_step in range(1 + start_step, n_iters + 1):
        if global_step in thres_schedule and hasattr(mcfg, "fast_color_thres"):
            new_thres = float(thres_schedule[global_step])
            if new_thres != mcfg.fast_color_thres:
                mcfg = dataclasses.replace(mcfg, fast_color_thres=new_thres)
                step_fn = compile_step(mcfg, lr_anchor)
        if global_step in pg_scale:
            n_rest = len(pg_scale) - pg_scale.index(global_step) - 1
            cur_vox_density = int(cfg_model.num_voxels_density / (2**n_rest))
            cur_vox_rgb = int(cfg_model.num_voxels_rgb / (2**n_rest))
            params = state.params
            params, mcfg = scale_model(family, params, mcfg, cur_vox_density, cur_vox_rgb)
            params = params.replace(
                act_shift=params.act_shift - cfg_train.decay_after_scale
            )
            if deferred_budget:
                # occupancy just refreshed from trained density -> the
                # fixed-budget compaction is now safe; enable it
                mcfg = dataclasses.replace(mcfg, sample_budget=deferred_budget)
                deferred_budget = 0
            if deferred_ts_budget and global_step == max(pg_scale):
                # final resolution reached -> two-stage training is safe
                mcfg = dataclasses.replace(
                    mcfg, train_survivor_budget=deferred_ts_budget
                )
                deferred_ts_budget = 0
            # optimizer rebuilt from scratch at the boundary (run_train.py:199)
            # — which also resets the lr decay to the base lr (the factory
            # is called with global_step=0): re-anchor the decay here
            lr_anchor = global_step
            state = place(
                create_train_state(params, cfg_train, start_step=global_step - 1)
            )
            step_fn = compile_step(mcfg, lr_anchor)

        # fold_in (not sequential splits): step s gets the same key whether or
        # not the run was interrupted, so kill-and-resume reproduces the exact
        # trajectory of an uninterrupted run (given restored opt state).
        k_step = jax.random.fold_in(key, global_step)
        state, metrics = step_fn(state, k_step)

        if global_step % log_every == 0 or global_step == n_iters:
            m = jax.device_get(metrics)
            last_psnr = float(m["psnr"])
            psnr_hist.append(last_psnr)
            eps = time.time() - t0
            log_fn(
                f"{stage} iter {global_step:6d} / loss {float(m['loss']):.6f} / "
                f"psnr {last_psnr:5.2f} / {eps:6.1f}s"
            )
            if exp_dir is not None and jax.process_index() == 0:
                import json as _json
                import os as _os

                # EVERY scalar the step emits lands in the series: loss,
                # mse, psnr, each enabled loss component (unweighted),
                # lr_scale, overflow_frac (two-stage truncation — the
                # survivor-budget claim is only auditable if logged)
                rec = {"step": global_step, "elapsed_s": round(eps, 2)}
                for mk in sorted(m):
                    mv = np.asarray(m[mk])
                    if mv.ndim == 0:
                        rec[mk] = float(mv)
                with open(_os.path.join(exp_dir, f"{stage}_metrics.jsonl"), "a") as f:
                    f.write(_json.dumps(rec) + "\n")
        # periodic held-out panel (TensorBoardLogger val-image equivalent)
        if (i_panel and exp_dir is not None and jax.process_index() == 0
                and (global_step % i_panel == 0 or global_step == n_iters)):
            _write_eval_panel(mcfg, state.params, global_step)
        # periodic checkpoint (the reference's --i_weights cadence);
        # multi-host: only process 0 writes (params are fully replicated)
        if (save_every and exp_dir is not None and jax.process_index() == 0
                and global_step % save_every == 0 and global_step < n_iters):
            import os as _os

            from unboundednerfpytorch_tpu.utils import checkpoint as _ckpt

            # persist the TRUE sample_budget, not the deferral-zeroed one:
            # a resume from this checkpoint must re-enter the deferral logic
            # with the configured budget or it stays off forever
            _save_mcfg = mcfg
            if deferred_budget:
                _save_mcfg = dataclasses.replace(
                    _save_mcfg, sample_budget=deferred_budget
                )
            if deferred_ts_budget:
                _save_mcfg = dataclasses.replace(
                    _save_mcfg, train_survivor_budget=deferred_ts_budget
                )
            _ckpt.save_model(
                _os.path.join(exp_dir, f"{stage}_last"), family, _save_mcfg,
                state.params, global_step=global_step,
                opt_state=state.opt_state,
            )
        if callback is not None:
            callback(global_step, metrics)

    if exp_dir is not None and jax.process_index() == 0:
        import os

        from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

        # see the periodic-save note: never persist a deferral-zeroed budget
        save_mcfg = mcfg
        if deferred_budget:
            save_mcfg = dataclasses.replace(
                save_mcfg, sample_budget=deferred_budget
            )
        if deferred_ts_budget:
            save_mcfg = dataclasses.replace(
                save_mcfg, train_survivor_budget=deferred_ts_budget
            )
        ckpt_mod.save_model(
            os.path.join(exp_dir, f"{stage}_last"), family, save_mcfg,
            state.params, global_step=n_iters, opt_state=state.opt_state,
        )
    return family, mcfg, state.params, last_psnr


def run_train_blocks(
    cfg: ExpConfig,
    data_dict: dict,
    block_num: int,
    exp_dir: str,
    seed: int = 777,
    log_fn=print,
    merge: bool = True,
    no_reload: bool = False,
    save_every: int = 0,
):
    """Scene/block-parallel training (run_FourierGrid.py:101-103 +
    run_render.py:146-207 semantics): partition the (position-sorted)
    training views into `block_num` contiguous blocks, train each
    independently (embarrassingly parallel — blocks can map to hosts), save
    per-block checkpoints fine_last_{i}, then device-side min-merge them
    (FourierGrid_ckpt_manager.merge_blocks).

    Each block trains in its own exp subdir with the reference's implicit
    resume semantics applied per block (run_train.py:112-136): a crash at
    block 7 of 8 reruns into block 7's partial state, not block 0."""
    import os

    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt

    i_train = np.asarray(data_dict["i_train"])
    per_block = int(np.ceil(len(i_train) / block_num))
    paths = []
    for b in range(block_num):
        ids = i_train[b * per_block : (b + 1) * per_block]
        if ids.size == 0:
            continue
        path = os.path.join(exp_dir, f"fine_last_{b}")
        if not no_reload and os.path.exists(os.path.join(path, "meta.json")):
            log_fn(f"block {b}: already complete ({path}), skipping")
            paths.append(path)
            continue
        sub = dict(data_dict)
        sub["i_train"] = ids
        log_fn(f"block {b}: training on {len(ids)} views")
        family, mcfg, params, psnr = run_train(
            cfg, sub, seed=seed + b, log_fn=log_fn,
            exp_dir=os.path.join(exp_dir, f"block_{b}"),
            no_reload=no_reload, save_every=save_every,
        )
        ckpt.save_model(path, family, mcfg, params)
        paths.append(path)
        log_fn(f"block {b}: psnr {psnr:.2f} -> {path}")
    if merge and len(paths) > 1:
        merged = os.path.join(exp_dir, "fine_last_merged")
        ckpt.merge_blocks(paths, merged)
        log_fn(f"merged {len(paths)} blocks -> {merged}")
    return paths


def run_train(cfg: ExpConfig, data_dict: dict, seed: int = 777, log_fn=print,
              exp_dir: str | None = None, no_reload: bool = False,
              no_reload_optimizer: bool = False, save_every: int = 0,
              use_mesh: bool | None = None, grid_parallel: int = 1,
              ft_path: str = ""):
    """Full two-stage recipe (run_train.py:336-398). Returns the fine model."""
    xyz_min_c, xyz_max_c = bbox_mod.compute_bbox_by_cam_frustrm(
        cfg, data_dict, model_family_name(cfg)
    )
    coarse_out = None
    if cfg.coarse_train.N_iters > 0:
        coarse_out = scene_rep_reconstruction(
            cfg, cfg.coarse_model_and_render, cfg.coarse_train,
            xyz_min_c, xyz_max_c, data_dict, stage="coarse",
            seed=seed, log_fn=log_fn, exp_dir=exp_dir, no_reload=no_reload,
            no_reload_optimizer=no_reload_optimizer, save_every=save_every,
            use_mesh=use_mesh, grid_parallel=grid_parallel, ft_path=ft_path,
        )

    if coarse_out is None or cfg.data.dataset_type == "waymo":
        xyz_min_f, xyz_max_f = xyz_min_c, xyz_max_c
        coarse_mask = None
    else:
        family_c, mcfg_c, params_c, _ = coarse_out
        xyz_min_f, xyz_max_f = bbox_mod.compute_bbox_by_coarse_geo(
            params_c, mcfg_c,
            lambda d: dvgo.activate_density(params_c, mcfg_c, d),
            cfg.fine_model_and_render.bbox_thres,
        )
        # fine-stage occupancy from the coarse solution (the reference's
        # mask_cache_path ckpt reload, grid.py:210-220): pooled coarse alpha
        # thresholded at mask_cache_thres, evaluated on the fine world grid
        def coarse_mask_fn(fine_world_size, fine_xyz_min, fine_xyz_max):
            from unboundednerfpytorch_tpu.ops import interp as interp_ops

            axes = [jnp.linspace(mn, mx, int(n)) for mn, mx, n in
                    zip(fine_xyz_min, fine_xyz_max, fine_world_size)]
            xyz = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1)
            density = params_c.density(xyz)[..., 0]
            alpha = dvgo.activate_density(params_c, mcfg_c, density)
            pooled = interp_ops.max_pool_3d_same(alpha)
            return pooled >= cfg.fine_model_and_render.mask_cache_thres

        coarse_mask = coarse_mask_fn

    family, mcfg, params, psnr = scene_rep_reconstruction(
        cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min_f, xyz_max_f, data_dict, stage="fine",
        seed=seed, log_fn=log_fn, exp_dir=exp_dir, no_reload=no_reload,
        no_reload_optimizer=no_reload_optimizer, save_every=save_every,
        coarse_mask_fn=coarse_mask, use_mesh=use_mesh,
        grid_parallel=grid_parallel, ft_path=ft_path,
    )
    return family, mcfg, params, psnr
