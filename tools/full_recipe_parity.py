"""Full-recipe convergence-parity gate (VERDICT r3 next-round #1).

Runs the COMPLETE flagship FourierGrid recipe — the garden schedule of
``/root/reference/FourierGrid/configs/nerf_unbounded/garden_single.py``
scaled to a reduced resolution: all 8 pg_scale boundaries with occupancy
refreshes, the full 7-point fast_color_thres schedule, TV injection through
the tv_before=20000 crossing, nearclip/distortion/entropy/rgbper losses,
rand_bkgd, flatten sampler, lr re-anchoring (run_train.py:185-296) — on a
non-trivial synthetic unbounded scene (textured sphere cluster + ground slab
+ far background shell), through BOTH

  (a) the PRODUCTION training loop (`train/loop.run_train`, shipped TPU
      knobs: sample_budget 96, stride-2 probe, packed gathers), and
  (b) an independent torch mirror of the reference recipe (full march +
      the reference's dynamic fast_color_thres compaction, run per batch
      on the IDENTICAL batch stream),

then gates final held-out test PSNR within 0.1 dB and records the
psnr-vs-step curves for overlay. This is the closest achievable proxy for
the reference README benchmark table (`/root/reference/README.md:17-27`)
with no datasets: any slow-divergence bug the 60-step trajectory gates
cannot see (budget truncation, occupancy staleness, schedule mis-wiring,
optimizer drift) shows up as a converged-PSNR gap.

Usage (phases split so the torch mirror can run on CPU while the TPU is
free for other work):

  python tools/full_recipe_parity.py --phase production --out runs/frp
  python tools/full_recipe_parity.py --phase torch --out runs/frp
  python tools/full_recipe_parity.py --phase compare --out runs/frp

  (--phase torch forces the CPU platform itself — the JAX_PLATFORMS env
  var does not survive this box's sitecustomize; see main().)

  --smoke runs a compressed schedule (600 steps) to validate the plumbing.
  --arm bf16 (production phase) additionally measures the shipped
  bf16-grid configuration — informational, not part of the 0.1 dB gate
  (grid quantization is a measured cost, not a recipe bug).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SEED = 777  # default; --seed varies init + batch stream + bkgd for the null


# ---------------------------------------------------------------------------
# recipe config (reduced garden)
# ---------------------------------------------------------------------------


def build_cfg(smoke: bool = False, grid_dtype: str = "float32",
              pure: bool = False, ablate: str = ""):
    """The garden recipe (garden_single.py) at reduced resolution: 48^3
    final grids (vs 200^3), N_rand 512 (vs 2048), 30k steps (vs 100k) —
    every schedule element kept, incl. the shipped TPU fast-path knobs."""
    from unboundednerfpytorch_tpu.configs.schema import (
        DataConfig,
        ExpConfig,
        ModelRenderConfig,
        TrainStageConfig,
    )

    alpha_init, stepsize = 1e-4, 0.5
    if smoke:
        n_iters, n_rand, vox = 600, 256, 32
        pg = (100, 150, 200)
        thres_sched = (
            (0, alpha_init * stepsize / 10),
            (120, alpha_init * stepsize / 2),
            (260, 1e-4),
        )
        tv_before = tv_dense_before = 400
    else:
        n_iters, n_rand, vox = 30000, 512, 48
        pg = (2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000)
        thres_sched = (  # garden_single.py:12-21 verbatim
            (0, alpha_init * stepsize / 10),
            (1500, min(alpha_init, 1e-4) * stepsize / 5),
            (2500, min(alpha_init, 1e-4) * stepsize / 2),
            (3500, min(alpha_init, 1e-4) * stepsize / 1.5),
            (4500, min(alpha_init, 1e-4) * stepsize),
            (5500, min(alpha_init, 1e-4)),
            (6500, 1e-4),
        )
        tv_before = tv_dense_before = 20000

    return ExpConfig(
        expname="full_recipe_parity",
        model="FourierGrid",
        data=DataConfig(
            dataset_type="llff",
            spherify=True,
            white_bkgd=True,
            rand_bkgd=True,
            unbounded_inward=True,
            load2gpu_on_the_fly=True,
        ),
        coarse_train=TrainStageConfig(N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=n_iters,
            N_rand=n_rand,
            lrate_decay=80,
            pervoxel_lr=False,
            ray_sampler="flatten",
            # held-out eval panels every 2k steps (VERDICT r4 #8 evidence:
            # a 30k run leaves plottable curves + panels in its exp dir);
            # render-only, does not touch the training trajectory
            i_panel=0 if smoke else 2000,
            weight_main=1.0,
            weight_entropy_last=0.001,
            weight_rgbper=0.01,
            weight_nearclip=1.0,
            weight_distortion=0.01,
            pg_scale=pg,
            tv_before=tv_before,
            tv_dense_before=tv_dense_before,
            weight_tv_density=1e-6,
            weight_tv_k0=1e-7,
            skip_zero_grad_fields=("density", "k0"),
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_density=vox**3,
            num_voxels_rgb=vox**3,
            num_voxels_base_density=vox**3,
            num_voxels_base_rgb=vox**3,
            rgbnet_dim=12,
            rgbnet_depth=3,
            rgbnet_width=64,
            alpha_init=alpha_init,
            stepsize=stepsize,
            fast_color_thres=thres_sched[0][1],
            fast_color_thres_schedule=thres_sched,
            maskout_near_cam_vox=False,
            world_bound_scale=1,
            fourier_freq_num=3,
            bg_len=0.2,
            contracted_norm="inf",
            t_boundary=2.0,
            # shipped TPU fast-path knobs (nerf_unbounded_default.py).
            # --arm pure disables ALL of them (full march, no budgets):
            # the round-4 0.243 dB held-out gap's diagnosis arm — whatever
            # delta remains vs torch under `pure` is trajectory
            # decoherence, and the difference between arms is the true
            # fast-path cost.
            grid_dtype=grid_dtype,
            # one-at-a-time ablation arms (VERDICT r4 #1: name the feature
            # that costs dB, if any): sb0 = occupancy sample budget off,
            # stride1 = full-resolution budget probe, sv0 = two-stage
            # training forward off. `pure` = all off at once.
            sample_budget=0 if (pure or ablate == "sb0") else 96,
            budget_probe_stride=1 if (pure or ablate == "stride1") else 2,
            color_budget=0 if pure else 32,
            # two-stage TRAINING forward: active once the thres schedule
            # reaches 1e-4 — the torch mirror stays pure reference
            # semantics, so the gate covers the exact-gradient claim over
            # the full converged run
            train_survivor_budget=0 if (pure or ablate == "sv0") else 48,
        ),
    )


def make_scene(smoke: bool = False, out: str | None = None,
               n_train: int = 32, n_test: int = 4, hw: int = 128):
    """The gate scene. Round-5 default: 32 train views / 4 held-out at
    128x128 (VERDICT r4 #4 — the 12-view 64x64 scene overfit to the point
    where held-out PSNR was uninterpretable: train 51.7 vs held-out 12.6).
    Held-out views stay interleaved on the same orbit, so with 36 views the
    nearest train neighbors are ~10 deg away and the held-out signal is
    constrained by training coverage, not extrapolation.

    When `out` is given the scene is cached to ``<out>/scene.npz`` on first
    generation and loaded thereafter, so the production (TPU) and torch
    (CPU) phases see BIT-IDENTICAL ground truth — backend float drift in the
    analytic integrator is removed from the parity budget."""
    from unboundednerfpytorch_tpu.data import synthetic

    if smoke:
        return synthetic.make_unbounded_data_dict(n_train=6, n_test=2, H=40, W=40)
    cache = os.path.join(out, "scene.npz") if out else None
    if cache and os.path.exists(cache):
        with np.load(cache) as z:
            d = {k: z[k] for k in z.files}
        for k in ("near", "far", "near_clip"):
            d[k] = float(d[k])
        d["irregular_shape"] = bool(d["irregular_shape"])
        return d
    d = synthetic.make_unbounded_data_dict(
        n_train=n_train, n_test=n_test, H=hw, W=hw
    )
    if cache:
        with open(cache + ".tmp", "wb") as f:
            np.savez(f, **d)
        os.replace(cache + ".tmp", cache)
    return d


# ---------------------------------------------------------------------------
# phase: production (the shipped loop, TPU)
# ---------------------------------------------------------------------------


def _suffix(seed: int) -> str:
    return "" if seed == SEED else f"_s{seed}"


def run_production(out: str, smoke: bool, arm: str = "f32", log=print,
                   seed: int = SEED) -> dict:
    import jax
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.train import loop

    cfg = build_cfg(smoke, "bfloat16" if arm == "bf16" else "float32",
                    pure=(arm == "pure"),
                    ablate=arm if arm in ("sb0", "stride1", "sv0") else "")
    data = make_scene(smoke, out)
    exp_dir = os.path.join(out, f"production_{arm}{_suffix(seed)}")
    os.makedirs(exp_dir, exist_ok=True)

    curve: list = []
    t0 = time.time()
    family, mcfg, params, train_psnr = loop.run_train(
        cfg, data, seed=seed, log_fn=log, exp_dir=exp_dir, no_reload=False,
        use_mesh=False,
    )
    # the psnr-vs-step curve from the loop's own metrics log
    metrics_path = os.path.join(exp_dir, "fine_metrics.jsonl")
    if os.path.exists(metrics_path):
        curve = []
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                curve.append([int(rec["step"]), float(rec["psnr"])])
    train_s = time.time() - t0

    # held-out eval through the production renderer (exact forward, the
    # trained config incl. its sample budget; thres = final schedule value)
    test_psnr, exact_imgs = eval_production(family, mcfg, params, data, cfg)
    # the shipped density-baked render mode on the SAME trained scene: its
    # scene-PSNR cost on a non-trivial cluttered scene (VERDICT r3 weak #6 —
    # previously only measured against bench.py's own scene). The `pure`
    # diagnosis arm has no two-stage cache (color_budget=0) — skip.
    if arm == "pure":
        # no two-stage cache in the pure arm (color_budget=0): record None,
        # not NaN — json.dump's NaN token breaks strict parsers (ADVICE r4)
        baked_psnr = baked_delta = baked_cost = None
        baked_note = "baked n/a (pure arm)"
    else:
        baked_psnr, baked_delta = eval_production_baked(
            family, mcfg, params, data, cfg, exact_imgs
        )
        baked_psnr, baked_delta = float(baked_psnr), float(baked_delta)
        baked_cost = float(test_psnr - baked_psnr)
        baked_note = f"baked {baked_psnr:.3f}, cost {baked_cost:+.3f} dB"
    result = {
        "arm": arm,
        "seed": seed,
        "train_psnr": float(train_psnr),
        "test_psnr": float(test_psnr),
        "test_psnr_baked": baked_psnr,
        "baked_cost_db": baked_cost,
        "baked_vs_exact_db": baked_delta,
        "curve": curve,
        "train_seconds": round(train_s, 1),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(out, f"production_{arm}{_suffix(seed)}.json"),
              "w") as f:
        json.dump(result, f)
    log(f"[production/{arm}{_suffix(seed)}] held-out test PSNR "
        f"{test_psnr:.3f} dB ({baked_note}; {train_s:.0f}s)")
    return result


def eval_production(family, mcfg, params, data, cfg):
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.render import renderer
    from unboundednerfpytorch_tpu.train import loop

    # held-out eval through the plain exact forward (the two-stage TRAINING
    # compaction is a training-throughput device; rendering never uses it)
    if getattr(mcfg, "train_survivor_budget", 0):
        mcfg = dataclasses.replace(mcfg, train_survivor_budget=0)
    render_kwargs = {
        "near": float(data["near"]),
        "far": float(data["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "stepsize": cfg.fine_model_and_render.stepsize,
    }
    fwd = loop.make_forward(family, mcfg, render_kwargs)
    i_test = np.asarray(data["i_test"])
    out = renderer.render_viewpoints(
        lambda aux, ro, rd, vd: fwd(aux, ro, rd, vd, None),
        np.asarray(data["poses"])[i_test],
        np.asarray(data["HW"])[i_test],
        np.asarray(data["Ks"])[i_test],
        gt_imgs=[np.asarray(data["images"])[i] for i in i_test],
        eval_ssim=False,
        chunk=4096,
        aux=params,
        verbose=False,
    )
    return float(np.mean(out["psnrs"])), out["rgbs"]


def eval_production_baked(family, mcfg, params, data, cfg, exact_imgs):
    """Held-out eval through the SHIPPED density-baked two-stage render
    cache (``density_bake_scale=2``, the unbounded-config render default).

    Returns (mean held-out PSNR vs GT, mean PSNR of the baked renders vs the
    exact renders) — the bake's measured quality cost on a full-recipe-trained
    cluttered scene, not just bench.py's own scene (VERDICT r3 weak #6)."""
    import jax

    from unboundednerfpytorch_tpu.models import fourier_grid as fg
    from unboundednerfpytorch_tpu.render import renderer
    from unboundednerfpytorch_tpu.train import loop
    from unboundednerfpytorch_tpu.utils import metrics as metrics_utils

    mcfg_b = dataclasses.replace(
        mcfg, train_survivor_budget=0, density_bake_scale=2.0
    )
    cache = fg.build_render_cache(params, mcfg_b)
    jax.block_until_ready(cache)
    render_kwargs = {
        "near": float(data["near"]),
        "far": float(data["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "stepsize": cfg.fine_model_and_render.stepsize,
    }
    fwd = loop.make_forward(family, mcfg_b, render_kwargs)
    i_test = np.asarray(data["i_test"])
    out = renderer.render_viewpoints(
        lambda aux, ro, rd, vd: fwd(aux[0], ro, rd, vd, None, cache=aux[1]),
        np.asarray(data["poses"])[i_test],
        np.asarray(data["HW"])[i_test],
        np.asarray(data["Ks"])[i_test],
        gt_imgs=[np.asarray(data["images"])[i] for i in i_test],
        eval_ssim=False,
        chunk=4096,
        aux=(params, cache),
        verbose=False,
    )
    vs_exact = [
        float(metrics_utils.psnr(np.asarray(b), np.asarray(e)))
        for b, e in zip(out["rgbs"], exact_imgs)
    ]
    return float(np.mean(out["psnrs"])), float(np.mean(vs_exact))


# ---------------------------------------------------------------------------
# phase: torch mirror (reference semantics, identical batch stream)
# ---------------------------------------------------------------------------


def _torch_fg_forward_full(
    t_d, t_k, t_mlp, pts, t_vals, viewdirs, act_shift, interval, viewbase_pe,
    num_freqs, thres, bg_color, half_extent=1.2, target=None, n_max=None,
):
    """FourierGrid forward with the reference's BOTH fast_color_thres
    compactions (FourierGrid_model.py:586-614): density on the full march,
    alpha>thres compaction, transmittance scan, weights>thres compaction,
    then k0/MLP only on the surviving samples (dynamic shapes — fine in
    torch on CPU; this is exactly the reference's sparsity mechanism).

    Returns (rgb_marched, aux dict for the loss zoo)."""
    import torch

    from tools.parity_run import _torch_fourier_query, _torch_scan

    N, S, _ = pts.shape
    pts = pts / half_extent  # symmetric bbox ±(1+bg_len) -> [-1,1]
    density_full = _torch_fourier_query(t_d, pts, num_freqs)[..., 0]
    softplus = torch.nn.functional.softplus(density_full + act_shift)
    alpha = 1.0 - torch.exp(-softplus * interval)
    mask = torch.ones_like(alpha, dtype=torch.bool)
    if thres > 0:
        mask = mask & (alpha > thres)
    alpha = torch.where(mask, alpha, torch.zeros_like(alpha))
    weights, alphainv = _torch_scan(alpha)
    if thres > 0:
        mask = mask & (weights > thres)
        weights = weights * mask.to(weights.dtype)

    # color pass on survivors only (the reference's second compaction)
    ray_id, samp_id = torch.nonzero(mask, as_tuple=True)
    pts_s = pts[ray_id, samp_id]  # [M, 3]
    k0 = _torch_fourier_query(t_k, pts_s[None], num_freqs)[0]  # [M, C]
    freqs = 2 ** torch.arange(viewbase_pe, dtype=torch.float32)
    vd = viewdirs[ray_id]
    emb = (vd[..., None] * freqs).reshape(vd.shape[0], -1)
    vemb = torch.cat([vd, emb.sin(), emb.cos()], -1)
    h = torch.cat([k0, vemb], -1)
    n_layers = len(t_mlp) // 2
    for i in range(n_layers):
        h = h @ t_mlp[2 * i] + t_mlp[2 * i + 1]
        if i < n_layers - 1:
            h = torch.relu(h)
    rgb = torch.sigmoid(h)  # [M, 3]
    w_s = weights[ray_id, samp_id]
    marched = torch.zeros(N, 3, dtype=rgb.dtype)
    marched = marched.index_add(0, ray_id, w_s[:, None] * rgb)
    marched = marched + alphainv[:, None] * bg_color

    aux = {
        "weights": weights,
        "alphainv": alphainv,
        "mask": mask,
        "ray_id": ray_id,
        "samp_id": samp_id,
        "rgb_raw": rgb,
        "w_s": w_s,
        "density_s": density_full[ray_id, samp_id],
        "t_s": (t_vals.expand(N, S) if t_vals.dim() == 1 else t_vals)[
            ray_id, samp_id
        ],
    }
    return marched, aux


def run_torch_mirror(out: str, smoke: bool, log=print,
                     seed: int = SEED) -> dict:
    import torch

    import jax
    import jax.numpy as jnp

    from tools.parity_run import (
        _TorchMaskedAdam,
        _torch_resize_banks,
        _torch_tv_grad,
    )
    from unboundednerfpytorch_tpu.configs.schema import normalize_fast_color_thres
    from unboundednerfpytorch_tpu.models import fourier_grid as fg
    from unboundednerfpytorch_tpu.optim.factory import lr_decay_scale
    from unboundednerfpytorch_tpu.train import bbox as bbox_mod
    from unboundednerfpytorch_tpu.train import loop
    from unboundednerfpytorch_tpu.train.step import HostRayStoreSampler

    torch.manual_seed(0)
    cfg = build_cfg(smoke, "float32")
    tcfg = cfg.fine_train
    data = make_scene(smoke, out)

    # identical model init: replay the loop's key derivation
    # (scene_rep_reconstruction: key=PRNGKey(seed); key, k_model = split)
    xyz_min, xyz_max = bbox_mod.compute_bbox_by_cam_frustrm(
        cfg, data, "FourierGrid"
    )
    key = jax.random.PRNGKey(seed)
    key, k_model = jax.random.split(key)
    family, mcfg, params0 = loop.build_model(
        cfg, cfg.fine_model_and_render, tcfg, xyz_min, xyz_max, k_model,
        n_train=len(np.asarray(data["i_train"])),
    )
    assert family == "FourierGrid"
    # the mirror is the REFERENCE recipe: full march, no TPU budget
    mcfg = dataclasses.replace(
        mcfg, sample_budget=0, color_budget=0, budget_probe_stride=1,
        train_survivor_budget=0,
    )

    t_d = torch.tensor(np.asarray(params0.density.grid, np.float32)).requires_grad_()
    t_k = torch.tensor(np.asarray(params0.k0.grid, np.float32)).requires_grad_()
    t_mlp = []
    for w, b in zip(params0.rgbnet.weights, params0.rgbnet.biases):
        t_mlp += [
            torch.tensor(np.asarray(w, np.float32)).requires_grad_(),
            torch.tensor(np.asarray(b, np.float32)).requires_grad_(),
        ]

    def fresh_opt():
        return _TorchMaskedAdam(
            [(t_d, tcfg.lrate_density, True), (t_k, tcfg.lrate_k0, True)]
            + [(p, tcfg.lrate_rgbnet, False) for p in t_mlp]
        )

    opt = fresh_opt()

    # identical batch stream: replay the loop's host flatten sampler
    store = loop.gather_training_rays(cfg, data, host=True)
    sampler = HostRayStoreSampler(
        store, tcfg.N_rand, seed=seed, mode="flatten"
    )

    # shared contracted-sampling geometry (same production fn; contraction
    # parity itself is gated in tests/test_ops_golden.py)
    @functools.lru_cache(maxsize=4)
    def geom_for(world_len_key):
        cfg_now = cfg_holder["mcfg"]
        return jax.jit(lambda ro, rd: fg.sample_ray(cfg_now, ro, rd)[0::2])

    cfg_holder = {"mcfg": mcfg}
    thres0, thres_schedule = normalize_fast_color_thres(
        cfg.fine_model_and_render
    )
    thres_schedule = dict(thres_schedule)
    thres = thres0
    act_shift = float(mcfg.act_shift)
    near_thres = float(data["near_clip"]) / float(mcfg.scene_radius[0])
    anchor = 1
    pg_scale = list(tcfg.pg_scale)
    n_iters = tcfg.N_iters

    def cur_interval():
        return cfg_holder["mcfg"].stepsize * cfg_holder["mcfg"].voxel_size_ratio_density

    def cur_ws_max():
        return float(max(cfg_holder["mcfg"].world_size))

    curve = []
    t0 = time.time()
    for step in range(1, n_iters + 1):
        if step in thres_schedule:
            thres = float(thres_schedule[step])
        if step in pg_scale:
            n_rest = len(pg_scale) - pg_scale.index(step) - 1
            cur_vox = int(cfg.fine_model_and_render.num_voxels_density / (2**n_rest))
            cfg_holder["mcfg"] = cfg_holder["mcfg"].with_num_voxels(
                cur_vox, cur_vox
            )
            geom_for.cache_clear()
            t_d = _torch_resize_banks(t_d, cfg_holder["mcfg"].world_size_density)
            t_k = _torch_resize_banks(t_k, cfg_holder["mcfg"].world_size_rgb)
            act_shift -= float(tcfg.decay_after_scale)
            opt = fresh_opt()
            anchor = step

        batch = sampler.next_batch()
        n_rand = batch["rgb"].shape[0]
        pts_j, t_j = geom_for(cfg_holder["mcfg"].world_len_density)(
            jnp.asarray(batch["rays_o"]), jnp.asarray(batch["rays_d"])
        )
        pts = torch.tensor(np.asarray(pts_j))
        t_vals = torch.tensor(np.asarray(t_j))
        target = torch.tensor(np.asarray(batch["rgb"], np.float32))
        vd = torch.tensor(np.asarray(batch["viewdirs"], np.float32))

        # rand_bkgd colors: the SAME stream the production loop draws
        # (forward uses its jit key = fold_in(key, step) directly)
        k_step = jax.random.fold_in(key, step)
        bg_color = torch.tensor(np.asarray(
            jax.random.uniform(k_step, (n_rand, 3)), np.float32
        ))

        marched, aux = _torch_fg_forward_full(
            t_d, t_k, t_mlp, pts, t_vals, vd, act_shift,
            float(cur_interval()), 4, cfg_holder["mcfg"].fourier_freq_num,
            thres, bg_color,
            half_extent=1.0 + cfg_holder["mcfg"].bg_len,
        )
        S = pts.shape[1]
        mse = ((marched - target) ** 2).mean()
        loss = tcfg.weight_main * mse
        p = aux["alphainv"].clamp(1e-6, 1 - 1e-6)
        loss = loss + tcfg.weight_entropy_last * (
            -(p * torch.log(p) + (1 - p) * torch.log(1 - p)).mean()
        )
        # nearclip on SURVIVORS (run_train.py:262-268 indexes compacted t)
        near_mask = (aux["t_s"] < near_thres).to(torch.float32)
        loss = loss + tcfg.weight_nearclip * (
            (aux["density_s"] - aux["density_s"].detach()) * near_mask
        ).sum()
        # distortion (prefix-sum form) on the full-shape masked weights
        w_t = aux["weights"]
        s2 = (1.0 - 1.0 / (1.0 + t_vals))[None, :].expand_as(w_t)
        w_pre = torch.cumsum(w_t, -1) - w_t
        ws_pre = torch.cumsum(w_t * s2, -1) - w_t * s2
        dist = (
            (2 * w_t * (s2 * w_pre - ws_pre)).sum()
            + ((1.0 / 3.0) * (1.0 / S) * w_t**2).sum()
        ) / n_rand
        loss = loss + tcfg.weight_distortion * dist
        # rgbper on survivors (run_train.py:277-279)
        per = ((aux["rgb_raw"] - target[aux["ray_id"]]) ** 2).sum(-1)
        loss = loss + tcfg.weight_rgbper * (
            (per * aux["w_s"].detach()).sum() / n_rand
        )
        loss.backward()

        gate = (
            step < tcfg.tv_before
            and step > tcfg.tv_after
            and step % tcfg.tv_every == 0
        )
        if gate:
            dense = step < tcfg.tv_dense_before
            with torch.no_grad():
                for par, weight in (
                    (t_d, tcfg.weight_tv_density),
                    (t_k, tcfg.weight_tv_k0),
                ):
                    if weight <= 0:
                        continue
                    bw = weight / n_rand * cur_ws_max() / 128.0
                    par.grad += _torch_tv_grad(par, bw, bw, bw, dense, par.grad)
        opt.step(float(lr_decay_scale(max(step - anchor, 0), tcfg.lrate_decay)))

        if step % 100 == 0 or step == n_iters:
            psnr = -10 * np.log10(float(mse.detach()))
            curve.append([step, psnr])
            if step % 1000 == 0 or step == n_iters:
                log(f"[torch] step {step:6d} psnr {psnr:5.2f} "
                    f"({time.time() - t0:6.0f}s)")

    # held-out eval: full-image renders at the final thres
    i_test = np.asarray(data["i_test"])
    from unboundednerfpytorch_tpu.ops import rays as ray_ops

    mses = []
    geom = geom_for(cfg_holder["mcfg"].world_len_density)
    with torch.no_grad():
        for i in i_test:
            H, W = (int(v) for v in np.asarray(data["HW"])[i])
            ro, rd, vdirs = ray_ops.get_rays_of_a_view(
                H, W, jnp.asarray(data["Ks"][i]),
                jnp.asarray(data["poses"][i][:3, :4]),
            )
            ro = np.asarray(ro).reshape(-1, 3)
            rd = np.asarray(rd).reshape(-1, 3)
            vdirs = np.asarray(vdirs).reshape(-1, 3)
            gt = np.asarray(data["images"][i]).reshape(-1, 3)
            preds = []
            for s0 in range(0, ro.shape[0], 4096):
                sl = slice(s0, s0 + 4096)
                pts_j, t_j = geom(jnp.asarray(ro[sl]), jnp.asarray(rd[sl]))
                n = ro[sl].shape[0]
                marched, _ = _torch_fg_forward_full(
                    t_d, t_k, t_mlp,
                    torch.tensor(np.asarray(pts_j)),
                    torch.tensor(np.asarray(t_j)),
                    torch.tensor(vdirs[sl]), act_shift,
                    float(cur_interval()), 4,
                    cfg_holder["mcfg"].fourier_freq_num, thres,
                    torch.ones(n, 3),
                    half_extent=1.0 + cfg_holder["mcfg"].bg_len,
                )
                preds.append(marched.numpy())
            pred = np.concatenate(preds)
            mses.append(float(np.mean((pred - gt) ** 2)))
    test_psnr = float(np.mean([-10 * np.log10(m) for m in mses]))

    result = {
        "seed": seed,
        "test_psnr": test_psnr,
        "curve": curve,
        "train_seconds": round(time.time() - t0, 1),
    }
    with open(os.path.join(out, f"torch{_suffix(seed)}.json"), "w") as f:
        json.dump(result, f)
    log(f"[torch{_suffix(seed)}] held-out test PSNR {test_psnr:.3f} dB")
    return result


# ---------------------------------------------------------------------------
# phase: compare
# ---------------------------------------------------------------------------


def compare(out: str, tol_db: float = 0.1, log=print, torch_log=None,
            seed: int = SEED) -> dict:
    """Gate |production − torch| held-out delta at ``tol_db`` for one seed
    pair (default 777; --seed gates another pair and writes a suffixed
    compare file). Ablation-arm reporting rides along for the default
    seed."""
    with open(os.path.join(out, f"production_f32{_suffix(seed)}.json")) as f:
        prod = json.load(f)
    torch_json = os.path.join(out, f"torch{_suffix(seed)}.json")
    if not os.path.exists(torch_json) and torch_log:
        # PARTIAL compare: the torch mirror is still running (or was cut
        # off) — rebuild its curve from the phase log. REPORT-ONLY: no gate
        # is applied in partial mode (no held-out delta exists yet and the
        # curve-tail delta is merely recorded); the assert below is skipped.
        import re

        curve = []
        with open(torch_log) as f:
            for line in f:
                m = re.search(r"step\s+(\d+) psnr ([0-9.]+)", line)
                if m:
                    curve.append([int(m.group(1)), float(m.group(2))])
        tor = {"test_psnr": None, "curve": curve, "partial": True}
    else:
        with open(torch_json) as f:
            tor = json.load(f)
    partial = bool(tor.get("partial"))
    delta = (
        abs(prod["test_psnr"] - tor["test_psnr"]) if not partial else None
    )

    # curve overlay: per-step |Δ| at shared checkpoints in the converged
    # tail (last 25% of steps)
    pc = dict((s, p) for s, p in prod["curve"])
    tc = dict((s, p) for s, p in tor["curve"])
    shared = sorted(set(pc) & set(tc))
    # shared may be empty (e.g. --torch_log on an early/empty log) — degrade
    # to a no-curve partial result instead of IndexError (ADVICE r4)
    tail = [s for s in shared if s >= shared[-1] * 0.75] if shared else []
    tail_delta = float(np.mean([abs(pc[s] - tc[s]) for s in tail])) if tail else None

    result = {
        "seed": seed,
        "production_test_psnr": prod["test_psnr"],
        "torch_test_psnr": tor["test_psnr"],
        "delta_db": round(delta, 4) if delta is not None else None,
        "tol_db": tol_db,
        "curve_tail_mean_delta_db": (
            round(tail_delta, 4) if tail_delta is not None else None
        ),
        "passed": (delta <= tol_db) if delta is not None else None,
    }
    if partial:
        result["partial"] = True
        result["torch_last_step"] = shared[-1] if shared else 0
    if prod.get("test_psnr_baked") is not None:
        # the shipped density-baked render mode's measured scene-PSNR cost
        # on this full-recipe-trained scene (VERDICT r3 weak #6)
        result["baked_test_psnr"] = prod["test_psnr_baked"]
        result["baked_cost_db"] = round(prod["baked_cost_db"], 4)
        result["baked_vs_exact_db"] = round(prod["baked_vs_exact_db"], 2)
    # arm files are unsuffixed (seed-777); pairing them against another
    # seed's production run would be apples-to-oranges — all arm reporting
    # below is seed-777-only
    bf16_path = os.path.join(out, "production_bf16.json")
    if seed != SEED:
        bf16_path = "/nonexistent"
    if os.path.exists(bf16_path):
        with open(bf16_path) as f:
            bf = json.load(f)
        result["bf16_test_psnr"] = bf["test_psnr"]
        result["bf16_vs_f32_db"] = round(bf["test_psnr"] - prod["test_psnr"], 4)
    pure_path = os.path.join(out, "production_pure.json")
    if seed != SEED:
        pure_path = "/nonexistent"
    if os.path.exists(pure_path) and tor.get("test_psnr") is not None:
        # diagnosis arm: torch-vs-pure isolates trajectory decoherence;
        # pure-vs-f32 isolates the TPU fast paths' quality cost
        with open(pure_path) as f:
            pure = json.load(f)
        result["pure_test_psnr"] = pure["test_psnr"]
        result["pure_vs_torch_db"] = round(
            pure["test_psnr"] - tor["test_psnr"], 4
        )
        result["f32_vs_pure_db"] = round(
            prod["test_psnr"] - pure["test_psnr"], 4
        )
    # one-at-a-time ablation arms (VERDICT r4 #1: NAME the fast-path
    # feature that costs dB, if any): each arm turns ONE feature off the
    # f32 configuration — sb0 = occupancy sample budget, stride1 = probe
    # stride back to 1, sv0 = two-stage training forward
    for arm in ("sb0", "stride1", "sv0") if seed == SEED else ():
        arm_path = os.path.join(out, f"production_{arm}.json")
        if os.path.exists(arm_path):
            with open(arm_path) as f:
                a = json.load(f)
            result[f"{arm}_test_psnr"] = a["test_psnr"]
            result[f"{arm}_vs_f32_db"] = round(
                a["test_psnr"] - prod["test_psnr"], 4
            )
    with open(os.path.join(out, f"compare{_suffix(seed)}.json"), "w") as f:
        json.dump(result, f, indent=1)
    log(json.dumps(result))
    if not partial:
        assert delta <= tol_db, (
            f"full-recipe convergence parity FAILED: "
            f"|{prod['test_psnr']:.3f} - {tor['test_psnr']:.3f}| = "
            f"{delta:.3f} dB > {tol_db} dB"
        )
    return result


def null_distribution(out: str, log=print) -> dict:
    """Aggregate every seed's results into the seed-null distribution
    (VERDICT r4 #1): production PSNR spread across seeds sizes the intrinsic
    run-to-run noise of the recipe itself; per-seed |production − torch|
    deltas (where a matching torch seed exists) are the cross-implementation
    deltas the gate judges. Writes ``null.json``."""
    import glob
    import re

    prods, torches = {}, {}
    for path in glob.glob(os.path.join(out, "production_f32*.json")):
        m = re.search(r"production_f32(?:_s(\d+))?\.json$", path)
        if not m:
            continue
        with open(path) as f:
            prods[int(m.group(1) or SEED)] = json.load(f)["test_psnr"]
    for path in glob.glob(os.path.join(out, "torch*.json")):
        m = re.search(r"torch(?:_s(\d+))?\.json$", path)
        if not m:
            continue
        with open(path) as f:
            torches[int(m.group(1) or SEED)] = json.load(f)["test_psnr"]
    deltas = {
        s: round(prods[s] - torches[s], 4) for s in sorted(prods)
        if s in torches
    }
    pv = list(prods.values())
    result = {
        "production_seeds": {str(s): round(v, 4) for s, v in sorted(prods.items())},
        "torch_seeds": {str(s): round(v, 4) for s, v in sorted(torches.items())},
        "production_std_db": round(float(np.std(pv)), 4) if len(pv) > 1 else None,
        "production_range_db": (
            round(float(np.max(pv) - np.min(pv)), 4) if len(pv) > 1 else None
        ),
        "cross_impl_deltas_db": deltas,
    }
    with open(os.path.join(out, "null.json"), "w") as f:
        json.dump(result, f, indent=1)
    log(json.dumps(result))
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["production", "torch", "compare", "null", "all"])
    ap.add_argument("--out", default="runs/full_recipe_parity")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--arm", default="f32",
                    choices=["f32", "bf16", "pure", "sb0", "stride1", "sv0"],
                    help="pure = all TPU fast paths off (full march, no "
                         "budgets): the decoherence-vs-fast-path-cost "
                         "diagnosis arm; sb0/stride1/sv0 ablate one fast "
                         "path at a time off the f32 arm")
    ap.add_argument("--seed", type=int, default=SEED,
                    help="recipe seed (init + batch stream + rand_bkgd); "
                         "non-default seeds write suffixed result files "
                         "for the --phase null aggregation")
    ap.add_argument("--tol_db", type=float, default=0.1)
    ap.add_argument("--torch_log", default=None,
                    help="compare fallback: rebuild the torch curve from "
                         "this phase log when torch.json is absent "
                         "(partial, REPORT-ONLY — no gate applied)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    if args.phase == "torch":
        # Force the CPU platform FOR REAL. This box's sitecustomize imports
        # jax and registers the axon TPU plugin at interpreter startup with
        # a canonicalize_platform hook, so the JAX_PLATFORMS env var does
        # NOT keep the process off the TPU — and a torch-phase process that
        # touches the TPU takes the (exclusive) axon execution claim for
        # its whole multi-hour run, starving every other TPU job. The
        # config update below is the only reliable switch (valid until the
        # first backend init; same mechanism as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.phase in ("production", "all"):
        run_production(args.out, args.smoke, args.arm, seed=args.seed)
    if args.phase in ("torch", "all"):
        run_torch_mirror(args.out, args.smoke, seed=args.seed)
    if args.phase in ("compare", "all"):
        compare(args.out, args.tol_db, torch_log=args.torch_log,
                seed=args.seed)
    if args.phase == "null":
        null_distribution(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
