"""PSNR parity harness — the evidence generator for BASELINE.md.

Two modes:

**Trajectory parity (default, no data needed).** Trains BOTH an independent
PyTorch reference implementation of the DVGO recipe (torch F.grid_sample
grids + vectorized transmittance scan + the reference's masked-Adam update
math, ``/root/reference/FourierGrid/masked_adam.py:21-75`` /
``cuda/adam_upd_kernel.cu:25-40``) AND this framework's production train step
on IDENTICAL synthetic data with IDENTICAL ray batches, then compares
held-out PSNR. This extends the forward/grad allclose gates
(tests/test_torch_parity.py) to a full *training-trajectory* gate: optimizer
math, lr decay, loss, and the end-to-end fit must agree, not just one
forward/backward.

  python tools/parity_run.py --steps 200           # asserts |ΔPSNR| <= 0.1 dB

**Real-data runs (--real).** Runs the reference benchmark configs end-to-end
when datasets are present (tools/fetch_data.py) and prints the PSNR table to
compare against the reference README (`/root/reference/README.md:17-27`:
Mip-NeRF-360 avg 28.98 / garden; unbounded T&T avg 20.85 / truck):

  python tools/parity_run.py --real --data_root data \\
      --scenes lego garden truck
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

# script-mode bootstrap: `python tools/parity_run.py` puts tools/ (not the
# repo root) at sys.path[0], so the package import below would fail
import os as _os

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# ---------------------------------------------------------------------------
# torch reference implementation (independent math, reference semantics)
# ---------------------------------------------------------------------------


def _torch_forward(density_grid, k0_grid, mlp, pts01, mask, viewdirs,
                   act_shift, interval, viewbase_pe, bg):
    """DVGO forward in torch: grid_sample trilerp + vectorized transmittance
    scan with the CUDA early exit + viewdir-PE MLP head. Differentiable."""
    import torch
    import torch.nn.functional as F

    N, S, _ = pts01.shape

    def sample(grid_xyzc, coords01):
        g = grid_xyzc.permute(3, 0, 1, 2)[None]  # [1,C,X,Y,Z]
        ind = coords01.reshape(1, 1, 1, -1, 3).flip(-1) * 2 - 1
        out = F.grid_sample(g, ind, mode="bilinear", align_corners=True)
        return out.reshape(g.shape[1], -1).T.reshape(N, S, g.shape[1])

    density = sample(density_grid, pts01)[..., 0]
    e = torch.exp(density + act_shift)
    alpha = 1.0 - torch.pow(1.0 + e, -interval)
    alpha = torch.where(mask, alpha, torch.zeros_like(alpha))

    weights, alphainv = _torch_scan(alpha)

    k0 = sample(k0_grid, pts01)
    freqs = 2 ** torch.arange(viewbase_pe, dtype=torch.float32)
    emb = (viewdirs[..., None] * freqs).reshape(N, -1)
    vemb = torch.cat([viewdirs, emb.sin(), emb.cos()], -1)
    feat = torch.cat([k0, vemb[:, None, :].expand(N, S, vemb.shape[-1])], -1)
    h = feat
    n_layers = len(mlp) // 2
    for i in range(n_layers):
        h = h @ mlp[2 * i] + mlp[2 * i + 1]
        if i < n_layers - 1:
            h = torch.relu(h)
    rgb = torch.sigmoid(h)
    rgb_marched = torch.einsum("ns,nsc->nc", weights, rgb) + alphainv[:, None] * bg
    return rgb_marched


class _TorchMaskedAdam:
    """The reference's MaskedAdam in torch: skip-zero-grad moments, bias
    correction folded into the step size, and the per-element-lr variant
    (adam_upd_kernel.cu:25-58,72-121). Groups are
    ``(param, lr, skip_zero_grad[, per_lr_tensor])``; a per-lr group takes
    the ``adam_upd_with_perlr`` path (plain moments, update scaled by the
    per-element lr — it wins over skip_zero_grad, masked_adam.py:64-69)."""

    def __init__(self, groups, beta1=0.9, beta2=0.99, eps=1e-8):
        import torch

        self.groups = [
            (g[0], g[1], g[2], g[3] if len(g) > 3 else None) for g in groups
        ]
        self.b1, self.b2, self.eps = beta1, beta2, eps
        self.m = [torch.zeros_like(p) for p, _, _, _ in self.groups]
        self.v = [torch.zeros_like(p) for p, _, _, _ in self.groups]
        self.t = 0

    @classmethod
    def torch(cls):
        import torch

        return torch

    def step(self, lr_scale: float):
        import torch

        self.t += 1
        bias = (1.0 - self.b2**self.t) ** 0.5 / (1.0 - self.b1**self.t)
        with torch.no_grad():
            for i, (p, lr, skip, per) in enumerate(self.groups):
                g = p.grad
                if g is None:
                    continue
                step_size = lr * lr_scale * bias
                if skip and per is None:
                    mask = g != 0
                    self.m[i] = torch.where(
                        mask, self.b1 * self.m[i] + (1 - self.b1) * g, self.m[i]
                    )
                    self.v[i] = torch.where(
                        mask, self.b2 * self.v[i] + (1 - self.b2) * g * g,
                        self.v[i],
                    )
                    p -= torch.where(
                        mask,
                        step_size * self.m[i] / (self.v[i].sqrt() + self.eps),
                        torch.zeros_like(p),
                    )
                else:
                    self.m[i] = self.b1 * self.m[i] + (1 - self.b1) * g
                    self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g * g
                    upd = step_size * self.m[i] / (self.v[i].sqrt() + self.eps)
                    if per is not None:
                        upd = upd * per
                    p -= upd
                p.grad = None


# ---------------------------------------------------------------------------
# trajectory parity
# ---------------------------------------------------------------------------


def _flatten_rays(data, ndc: bool = False):
    """Flatten a data_dict's training views into ray/rgb stores (numpy)."""
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.ops import rays as ray_ops

    ro_l, rd_l, vd_l, rgb_l = [], [], [], []
    for i in data["i_train"]:
        H, W = (int(v) for v in data["HW"][i])
        ro, rd, vd = ray_ops.get_rays_of_a_view(
            H, W, jnp.asarray(data["Ks"][i]),
            jnp.asarray(data["poses"][i][:3, :4]), ndc=ndc,
        )
        ro_l.append(np.asarray(ro).reshape(-1, 3))
        rd_l.append(np.asarray(rd).reshape(-1, 3))
        vd_l.append(np.asarray(vd).reshape(-1, 3))
        rgb_l.append(np.asarray(data["images"][i]).reshape(-1, 3))
    return (np.concatenate(ro_l), np.concatenate(rd_l),
            np.concatenate(vd_l), np.concatenate(rgb_l))


def run_trajectory_parity(steps: int = 200, n_rand: int = 1024,
                          tol_db: float = 0.1, log=print,
                          pervoxel_lr: bool = False) -> dict:
    """Train torch-reference and framework on identical data/batches; return
    {"psnr_torch", "psnr_jax", "delta_db"}. Raises AssertionError on miss.

    ``pervoxel_lr=True`` additionally exercises the per-voxel learning rate
    (run_train.py:169-176 / adam_upd_with_perlr): the density grid's lr is
    scaled per voxel by view-count/max, computed by the production
    ``voxel_count_views`` and applied identically on both sides."""
    import torch

    import jax
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.configs.schema import TrainStageConfig
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.models import dvgo
    from unboundednerfpytorch_tpu.ops import sampling as S_ops
    from unboundednerfpytorch_tpu.optim.factory import lr_decay_scale
    from unboundednerfpytorch_tpu.train.step import create_train_state, make_train_step

    torch.manual_seed(0)

    # --- shared data: synthetic sphere scene, flattened ray store ----------
    data = synthetic.make_data_dict(n_views=8, H=48, W=48)
    RO, RD, VD, GT = _flatten_rays(data)

    cfg = dvgo.DVGOConfig(
        xyz_min=(-1.6, -1.6, -1.6), xyz_max=(1.6, 1.6, 1.6),
        num_voxels=32**3, num_voxels_base=32**3,
        rgbnet_dim=6, rgbnet_direct=True, rgbnet_depth=3, rgbnet_width=32,
        alpha_init=1e-2, fast_color_thres=0.0,
    )
    tcfg = TrainStageConfig(
        N_iters=steps, N_rand=n_rand, lrate_decay=20, pervoxel_lr=pervoxel_lr,
        weight_main=1.0, weight_entropy_last=0.0, weight_rgbper=0.0,
        weight_tv_density=0.0, weight_tv_k0=0.0,
        skip_zero_grad_fields=("density", "k0"),
    )
    near, stepsize, bg = float(data["near"]), 0.5, 1.0
    params = dvgo.create(cfg, jax.random.PRNGKey(0))
    interval = stepsize * cfg.voxel_size_ratio
    n_samples = dvgo.n_samples(cfg, stepsize)

    # identical init on both sides (export the jax init to torch)
    t_d = torch.tensor(np.asarray(params.density.grid)).requires_grad_()
    t_k = torch.tensor(np.asarray(params.k0.grid)).requires_grad_()
    t_mlp = []
    for w, b in zip(params.rgbnet.weights, params.rgbnet.biases):
        t_mlp += [
            torch.tensor(np.asarray(w)).requires_grad_(),
            torch.tensor(np.asarray(b)).requires_grad_(),
        ]
    # --- framework side: the production train step --------------------------
    def fwd(p, ro, rd, vd, key, img_index=None):
        return dvgo.forward(p, cfg, ro, rd, vd, near=near, stepsize=stepsize,
                            bg=bg)

    step_fn = jax.jit(make_train_step(
        fwd, tcfg, world_size_max=float(max(cfg.world_size)),
    ))
    state = create_train_state(params, tcfg)

    per_t = None
    if pervoxel_lr:
        # the production per-voxel lr (train/loop.py:468-487): density lr
        # scaled by per-voxel view counts from voxel_count_views, normalized
        # by the max; exported verbatim to the torch optimizer
        from unboundednerfpytorch_tpu.optim import factory as opt_factory
        from unboundednerfpytorch_tpu.optim.masked_adam import make_per_lr

        n_views = len(data["i_train"])
        hw = RO.shape[0] // n_views
        count = dvgo.voxel_count_views(
            params, cfg, jnp.asarray(RO.reshape(n_views, hw, 3)),
            jnp.asarray(RD.reshape(n_views, hw, 3)),
            near=near, stepsize=stepsize,
        )
        per_grid = count / jnp.maximum(count.max(), 1.0)
        trainable0, _ = opt_factory.split_trainable(params, tcfg)
        state = state.replace(per_lr=make_per_lr(
            trainable0, {"density": params.density.replace(grid=per_grid)}
        ))
        per_t = torch.tensor(np.asarray(per_grid))

    opt = _TorchMaskedAdam(
        [(t_d, tcfg.lrate_density, True, per_t),
         (t_k, tcfg.lrate_k0, True)]
        + [(p, tcfg.lrate_rgbnet, False) for p in t_mlp]
    )

    # shared sample geometry (gated elsewhere: tests/test_torch_parity.py
    # proves jax-vs-torch pts/grid_sample agreement; sharing it here isolates
    # the *trajectory* comparison to grids/scan/losses/optimizer)
    xyz_min = np.asarray(cfg.xyz_min, np.float32)
    xyz_max = np.asarray(cfg.xyz_max, np.float32)

    @jax.jit
    def geom(ro, rd):
        s = S_ops.sample_pts_on_rays(
            ro, rd, jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max),
            near, stepsize * cfg.voxel_size, n_samples,
        )
        return s.pts, s.mask

    rng = np.random.default_rng(42)
    t0 = time.time()
    for step in range(1, steps + 1):
        idx = rng.integers(0, RO.shape[0], size=n_rand)
        batch = {
            "rgb": jnp.asarray(GT[idx]),
            "rays_o": jnp.asarray(RO[idx]),
            "rays_d": jnp.asarray(RD[idx]),
            "viewdirs": jnp.asarray(VD[idx]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))

        # torch side, same batch
        pts, mask = geom(batch["rays_o"], batch["rays_d"])
        pts01 = (np.asarray(pts) - xyz_min) / (xyz_max - xyz_min)
        rgb_t = _torch_forward(
            t_d, t_k, t_mlp, torch.tensor(pts01),
            torch.tensor(np.asarray(mask)), torch.tensor(VD[idx]),
            float(cfg.act_shift), float(interval), cfg.viewbase_pe, bg,
        )
        loss_t = ((rgb_t - torch.tensor(GT[idx])) ** 2).mean()
        loss_t.backward()
        # step 1 trains at the undecayed base lr (the reference decays AFTER
        # each update, run_train.py:292-296) — matches make_train_step's
        # lr_anchor=1 default
        opt.step(float(lr_decay_scale(step - 1, tcfg.lrate_decay)))
        if step % 50 == 0 or step == steps:
            log(
                f"step {step:4d}: jax psnr "
                f"{float(metrics['psnr']):5.2f} / torch mse->psnr "
                f"{-10 * np.log10(float(loss_t.detach())):5.2f} "
                f"({time.time() - t0:5.1f}s)"
            )

    # --- held-out evaluation on a fixed ray set ------------------------------
    eval_idx = np.random.default_rng(7).integers(0, RO.shape[0], size=4096)
    res = fwd(state.params, jnp.asarray(RO[eval_idx]), jnp.asarray(RD[eval_idx]),
              jnp.asarray(VD[eval_idx]), None)
    mse_j = float(jnp.mean((res.rgb_marched - jnp.asarray(GT[eval_idx])) ** 2))
    pts, mask = geom(jnp.asarray(RO[eval_idx]), jnp.asarray(RD[eval_idx]))
    pts01 = (np.asarray(pts) - xyz_min) / (xyz_max - xyz_min)
    with torch.no_grad():
        rgb_t = _torch_forward(
            t_d, t_k, t_mlp, torch.tensor(pts01),
            torch.tensor(np.asarray(mask)), torch.tensor(VD[eval_idx]),
            float(cfg.act_shift), float(interval), cfg.viewbase_pe, bg,
        )
        mse_t = float(((rgb_t - torch.tensor(GT[eval_idx])) ** 2).mean())
    psnr_j = -10 * np.log10(mse_j)
    psnr_t = -10 * np.log10(mse_t)
    delta = abs(psnr_j - psnr_t)
    out = {
        "pervoxel_lr": pervoxel_lr,
        "psnr_torch": round(psnr_t, 3),
        "psnr_jax": round(psnr_j, 3),
        "delta_db": round(delta, 4),
        "steps": steps,
    }
    log(json.dumps(out))
    assert delta <= tol_db, (
        f"trajectory parity FAILED: |{psnr_j:.3f} - {psnr_t:.3f}| = "
        f"{delta:.3f} dB > {tol_db} dB"
    )
    return out


# ---------------------------------------------------------------------------
# trajectory parity — DMPIGO (forward-facing NDC / MPI)
# ---------------------------------------------------------------------------


def _torch_sample3d(grid_xyzc, pts01):
    """Trilinear sample of an [X,Y,Z,C] grid at [N,S,3] coords in [0,1]
    (torch grid_sample, align_corners, zyx flip)."""
    import torch
    import torch.nn.functional as F

    N, S, _ = pts01.shape
    g = grid_xyzc.permute(3, 0, 1, 2)[None]
    ind = pts01.reshape(1, 1, 1, -1, 3).flip(-1) * 2 - 1
    out = F.grid_sample(g, ind, mode="bilinear", align_corners=True)
    return out.reshape(g.shape[1], -1).T.reshape(N, S, g.shape[1])


def run_trajectory_parity_dmpigo(steps: int = 200, n_rand: int = 1024,
                                 tol_db: float = 0.1, log=print) -> dict:
    """DMPIGO (multiplane-image) trajectory gate: NDC equidistant sampling,
    per-depth act_shift line grid added to the density
    (dmpigo.py:47-57,275), zero-PE direct-viewdir rgb head, masked Adam —
    each mirrored independently in torch on identical batches."""
    import torch

    import jax
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.configs.schema import TrainStageConfig
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.models import dmpigo
    from unboundednerfpytorch_tpu.optim.factory import lr_decay_scale
    from unboundednerfpytorch_tpu.train.step import create_train_state, make_train_step

    torch.manual_seed(0)
    data = synthetic.make_data_dict(n_views=8, H=48, W=48)
    RO, RD, VD, GT = _flatten_rays(data, ndc=True)

    D = 32
    cfg = dmpigo.DMPIGOConfig(
        xyz_min=(-1.0, -1.0, 0.0), xyz_max=(1.0, 1.0, 1.0),
        num_voxels=24 * 24 * D * 4, mpi_depth=D,  # world (24, 24, D)
        rgbnet_dim=6, rgbnet_depth=3, rgbnet_width=32, viewbase_pe=0,
        fast_color_thres=0.0, stepsize=1.0,
    )
    bg = 1.0
    interval = cfg.stepsize * cfg.voxel_size_ratio
    n_samp = cfg.n_samples(cfg.stepsize)
    params = dmpigo.create(cfg, jax.random.PRNGKey(0))

    tcfg = TrainStageConfig(
        N_iters=steps, N_rand=n_rand, lrate_decay=20, pervoxel_lr=False,
        weight_main=1.0, weight_entropy_last=0.0, weight_rgbper=0.0,
        weight_tv_density=0.0, weight_tv_k0=0.0,
        skip_zero_grad_fields=("density", "k0"),
    )

    t_d = torch.tensor(np.asarray(params.density.grid)).requires_grad_()
    t_k = torch.tensor(np.asarray(params.k0.grid)).requires_grad_()
    t_act = torch.tensor(np.asarray(params.act_shift))  # frozen buffer
    t_mlp = []
    for w, b in zip(params.rgbnet.weights, params.rgbnet.biases):
        t_mlp += [
            torch.tensor(np.asarray(w)).requires_grad_(),
            torch.tensor(np.asarray(b)).requires_grad_(),
        ]
    opt = _TorchMaskedAdam(
        [(t_d, tcfg.lrate_density, True), (t_k, tcfg.lrate_k0, True)]
        + [(p, tcfg.lrate_rgbnet, False) for p in t_mlp]
    )

    def fwd(p, ro, rd, vd, key, img_index=None):
        return dmpigo.forward(p, cfg, ro, rd, vd, bg=bg)

    step_fn = jax.jit(make_train_step(
        fwd, tcfg, world_size_max=float(max(cfg.world_size)),
    ))
    state = create_train_state(params, tcfg)

    from unboundednerfpytorch_tpu.ops import sampling as S_ops

    @jax.jit
    def geom(ro, rd):
        s = S_ops.sample_ndc_pts_on_rays(
            ro, rd, jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max), n_samp
        )
        return s.pts, s.mask

    mn = np.asarray(cfg.xyz_min, np.float32)
    mx = np.asarray(cfg.xyz_max, np.float32)

    def torch_forward(pts, mask, vd):
        pts01 = torch.tensor((np.asarray(pts) - mn) / (mx - mn))
        maskt = torch.tensor(np.asarray(mask))
        density = _torch_sample3d(t_d, pts01)[..., 0]
        # per-depth act_shift: linear interp of the [D] line at z01
        zc = torch.clamp(pts01[..., 2], 0.0, 1.0) * (D - 1)
        i0 = torch.clamp(zc.floor().long(), 0, D - 2)
        f = zc - i0.to(zc.dtype)
        act = t_act[i0] * (1 - f) + t_act[i0 + 1] * f
        alpha = 1.0 - torch.exp(
            -torch.nn.functional.softplus(density + act) * interval
        )
        alpha = torch.where(maskt, alpha, torch.zeros_like(alpha))
        weights, alphainv = _torch_scan(alpha)
        k0 = _torch_sample3d(t_k, pts01)
        # viewbase_pe=0: the embedding is the raw view direction alone
        vdt = torch.tensor(vd)
        feat = torch.cat(
            [k0, vdt[:, None, :].expand(k0.shape[0], k0.shape[1], 3)], -1
        )
        h = feat
        n_layers = len(t_mlp) // 2
        for i in range(n_layers):
            h = h @ t_mlp[2 * i] + t_mlp[2 * i + 1]
            if i < n_layers - 1:
                h = torch.relu(h)
        rgb = torch.sigmoid(h)
        return torch.einsum("ns,nsc->nc", weights, rgb) + alphainv[:, None] * bg

    rng = np.random.default_rng(42)
    t0 = time.time()
    for step in range(1, steps + 1):
        idx = rng.integers(0, RO.shape[0], size=n_rand)
        batch = {
            "rgb": jnp.asarray(GT[idx]),
            "rays_o": jnp.asarray(RO[idx]),
            "rays_d": jnp.asarray(RD[idx]),
            "viewdirs": jnp.asarray(VD[idx]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        pts, mask = geom(batch["rays_o"], batch["rays_d"])
        rgb_t = torch_forward(pts, mask, VD[idx])
        loss_t = ((rgb_t - torch.tensor(GT[idx])) ** 2).mean()
        loss_t.backward()
        opt.step(float(lr_decay_scale(step - 1, tcfg.lrate_decay)))
        if step % 50 == 0 or step == steps:
            log(
                f"step {step:4d}: jax psnr "
                f"{float(metrics['psnr']):5.2f} / torch mse->psnr "
                f"{-10 * np.log10(float(loss_t.detach())):5.2f} "
                f"({time.time() - t0:5.1f}s)"
            )

    eval_idx = np.random.default_rng(7).integers(0, RO.shape[0], size=4096)
    res = fwd(state.params, jnp.asarray(RO[eval_idx]),
              jnp.asarray(RD[eval_idx]), jnp.asarray(VD[eval_idx]), None)
    mse_j = float(jnp.mean((res.rgb_marched - jnp.asarray(GT[eval_idx])) ** 2))
    pts, mask = geom(jnp.asarray(RO[eval_idx]), jnp.asarray(RD[eval_idx]))
    with torch.no_grad():
        rgb_t = torch_forward(pts, mask, VD[eval_idx])
        mse_t = float(((rgb_t - torch.tensor(GT[eval_idx])) ** 2).mean())
    psnr_j = -10 * np.log10(mse_j)
    psnr_t = -10 * np.log10(mse_t)
    delta = abs(psnr_j - psnr_t)
    out = {
        "model": "dmpigo",
        "psnr_torch": round(psnr_t, 3),
        "psnr_jax": round(psnr_j, 3),
        "delta_db": round(delta, 4),
        "steps": steps,
    }
    log(json.dumps(out))
    assert delta <= tol_db, (
        f"dmpigo trajectory parity FAILED: |{psnr_j:.3f} - {psnr_t:.3f}| = "
        f"{delta:.3f} dB > {tol_db} dB"
    )
    return out


# ---------------------------------------------------------------------------
# trajectory parity — flagship FourierGrid model
# ---------------------------------------------------------------------------


def _torch_fourier_query(grid_bxyzc, xyz_m11, num_freqs):
    """Reference Fourier-bank query in torch: positional-embed the FLIPPED
    normalized coords into 2K+1 per-bank grid_sample coordinates, mean over
    banks (FourierGrid_grid.py:60-78). grid [B,X,Y,Z,C]; xyz in [-1,1]."""
    import torch
    import torch.nn.functional as F

    B, C = grid_bxyzc.shape[0], grid_bxyzc.shape[-1]
    lead = xyz_m11.shape[:-1]
    M = int(np.prod(lead))
    # grid_sample's x coordinate indexes the LAST axis of [B,C,X,Y,Z], so the
    # zyx flip reproduces xyz-major indexing of the [X,Y,Z] layout
    ind = xyz_m11.reshape(M, 3).flip(-1)
    banks = [ind]
    freqs = 2 ** torch.arange(num_freqs, dtype=torch.float32)
    for k in range(num_freqs):
        banks.append(torch.sin(freqs[k] * ind))
        banks.append(torch.cos(freqs[k] * ind))
    g = grid_bxyzc.permute(0, 4, 1, 2, 3)
    # ONE batched grid_sample over the bank axis (the reference's own
    # batching, FourierGrid_grid.py:67-72) — ~2x the per-bank loop on CPU
    coords = torch.stack(banks).reshape(B, 1, 1, M, 3)
    v = F.grid_sample(g, coords, mode="bilinear", align_corners=True)
    out = v.reshape(B, C, M).permute(0, 2, 1).mean(0)
    return out.reshape(*lead, C)


def _torch_scan(alpha, early_exit=1e-3):
    """Transmittance scan with the CUDA early exit
    (render_utils_kernel.cu:592-601): returns (weights, alphainv_last)."""
    import torch

    one_minus = 1.0 - alpha
    t_incl = torch.cumprod(one_minus, dim=-1)
    t_excl = torch.cat([torch.ones_like(t_incl[..., :1]), t_incl[..., :-1]], -1)
    processed = t_excl >= early_exit
    weights = t_excl * alpha * processed.to(alpha.dtype)
    any_stop = (~processed).any(-1)
    first_stop = (~processed).to(torch.int64).argmax(-1)
    t_at_stop = torch.gather(t_excl, -1, first_stop[..., None])[..., 0]
    alphainv = torch.where(any_stop, t_at_stop, t_incl[..., -1])
    return weights, alphainv


def _torch_fg_forward(d_grid, k_grid, mlp, pts, viewdirs, act_shift,
                      interval, viewbase_pe, bg, half_extent, num_freqs,
                      full_output=False):
    """FourierGrid forward in torch (FourierGrid_model.py:554-672): Fourier
    bank queries on CONTRACTED points (shared geometry), softplus density
    activation, early-exit scan, viewdir-PE MLP head. Differentiable."""
    import torch

    N, S, _ = pts.shape
    norm = pts / half_extent  # symmetric bbox ±(1+bg_len) -> [-1,1]
    density = _torch_fourier_query(d_grid, norm, num_freqs)[..., 0]
    softplus = torch.nn.functional.softplus(density + act_shift)
    alpha = 1.0 - torch.exp(-softplus * interval)
    weights, alphainv = _torch_scan(alpha)

    k0 = _torch_fourier_query(k_grid, norm, num_freqs)
    freqs = 2 ** torch.arange(viewbase_pe, dtype=torch.float32)
    emb = (viewdirs[..., None] * freqs).reshape(N, -1)
    vemb = torch.cat([viewdirs, emb.sin(), emb.cos()], -1)
    feat = torch.cat(
        [k0, vemb[:, None, :].expand(N, S, vemb.shape[-1])], -1
    )
    h = feat
    n_layers = len(mlp) // 2
    for i in range(n_layers):
        h = h @ mlp[2 * i] + mlp[2 * i + 1]
        if i < n_layers - 1:
            h = torch.relu(h)
    rgb = torch.sigmoid(h)
    marched = torch.einsum("ns,nsc->nc", weights, rgb) + alphainv[:, None] * bg
    if full_output:
        return marched, weights, alphainv, rgb
    return marched


def _torch_tv_grad(param, wx, wy, wz, dense, existing_grad):
    """The reference TV gradient injection in torch
    (total_variation_kernel.cu:13-47): clamped ±1 directional diffs /6 per
    axis; sparse mode touches only voxels whose grad is already nonzero."""
    import torch

    def axis(a, ax, w):
        n = param.shape[ax]
        lo = param.narrow(ax, 0, n - 1)
        hi = param.narrow(ax, 1, n - 1)
        diff = torch.clamp(lo - hi, -1.0, 1.0)
        # pad along `ax`: grad[i] += w*diff_i (i<n-1); grad[i+1] -= w*diff_i
        z = torch.zeros_like(param.narrow(ax, 0, 1))
        g_lo = torch.cat([diff, z], dim=ax)
        g_hi = torch.cat([z, diff], dim=ax)
        return w * (g_lo - g_hi)

    nd = param.ndim
    g = (
        axis(param, nd - 4, wx / 6.0)
        + axis(param, nd - 3, wy / 6.0)
        + axis(param, nd - 2, wz / 6.0)
    )
    if not dense:
        g = torch.where(existing_grad != 0, g, torch.zeros_like(g))
    return g


def _torch_resize_banks(grid, new_size):
    """Trilinear bank-grid resize in torch ([B,X,Y,Z,C] channel-last like the
    jax side): the reference pg_scale resample (F.interpolate, grid.py:63-68)."""
    import torch
    import torch.nn.functional as F

    g = grid.detach().permute(0, 4, 1, 2, 3)  # [B,C,X,Y,Z]
    g = F.interpolate(g, size=tuple(int(v) for v in new_size),
                      mode="trilinear", align_corners=True)
    return g.permute(0, 2, 3, 4, 1).contiguous().requires_grad_()


def run_trajectory_parity_fourier(steps: int = 200, n_rand: int = 1024,
                                  tol_db: float = 0.1, log=print,
                                  loss_zoo: bool = False,
                                  pg_boundary: int | None = None) -> dict:
    """The flagship-model analog of :func:`run_trajectory_parity`: trains the
    production FourierGrid step (contracted sampling + 2K+1 Fourier banks +
    packed-corner gathers + masked Adam) and an independent torch mirror on
    identical batches; held-out PSNR must agree within ``tol_db``.

    ``loss_zoo=True`` additionally enables the full production loss assembly
    — entropy_last, rgbper (detached-weight), prefix-sum distortion, and the
    TV gradient injection between backward and the optimizer step
    (run_train.py:254-287), incl. the dense→sparse tv_dense_before switch —
    each mirrored independently in torch.

    ``pg_boundary=K`` starts at a quarter of the voxel count and crosses a
    progressive-upsampling boundary at step K, exercising the full production
    boundary semantics (run_train.py:187-201 / train/loop.py pg block):
    trilinear grid resample, act_shift -= decay_after_scale, optimizer
    rebuilt from scratch (fresh moments, bias-correction restart), and the
    lr decay re-anchored to the boundary — each mirrored in torch."""
    import torch

    import jax
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.configs.schema import TrainStageConfig
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.models import fourier_grid as fg
    from unboundednerfpytorch_tpu.optim.factory import lr_decay_scale
    from unboundednerfpytorch_tpu.train.step import create_train_state, make_train_step

    torch.manual_seed(0)
    data = synthetic.make_data_dict(n_views=8, H=48, W=48)
    RO, RD, VD, GT = _flatten_rays(data)

    cfg = fg.FourierGridConfig(
        scene_center=(0.0, 0.0, 0.0), scene_radius=(3.0, 3.0, 3.0),
        # a pg run starts at a quarter of the voxel count and doubles at the
        # boundary (run_train.py:187-196 with one remaining pg_scale entry
        # doubles num_voxels; /4 start keeps the resample non-trivial)
        num_voxels_density=(24**3) // 4 if pg_boundary else 24**3,
        num_voxels_rgb=(24**3) // 4 if pg_boundary else 24**3,
        num_voxels_base_density=24**3, num_voxels_base_rgb=24**3,
        alpha_init=1e-2, fast_color_thres=0.0, bg_len=0.2,
        fourier_freq_num=2, rgbnet_dim=6, rgbnet_depth=3, rgbnet_width=32,
        stepsize=0.5, t_boundary=2.0, sample_budget=0,
    )
    bg = 1.0
    interval = cfg.stepsize * cfg.voxel_size_ratio_density
    params = fg.create(cfg, jax.random.PRNGKey(0))

    zoo = dict(
        weight_entropy_last=1e-2, weight_rgbper=1e-2, weight_distortion=1e-2,
        weight_tv_density=1e-4, weight_tv_k0=1e-5,
        tv_every=1, tv_after=-1, tv_before=10**9,
        tv_dense_before=steps // 2,  # exercise BOTH dense and sparse modes
    ) if loss_zoo else dict(
        weight_entropy_last=0.0, weight_rgbper=0.0,
        weight_tv_density=0.0, weight_tv_k0=0.0,
    )
    tcfg = TrainStageConfig(
        N_iters=steps, N_rand=n_rand, lrate_decay=20, pervoxel_lr=False,
        weight_main=1.0, skip_zero_grad_fields=("density", "k0"), **zoo,
    )

    # identical init on both sides
    t_d = torch.tensor(np.asarray(params.density.grid)).requires_grad_()
    t_k = torch.tensor(np.asarray(params.k0.grid)).requires_grad_()
    t_mlp = []
    for w, b in zip(params.rgbnet.weights, params.rgbnet.biases):
        t_mlp += [
            torch.tensor(np.asarray(w)).requires_grad_(),
            torch.tensor(np.asarray(b)).requires_grad_(),
        ]
    opt = _TorchMaskedAdam(
        [(t_d, tcfg.lrate_density, True), (t_k, tcfg.lrate_k0, True)]
        + [(p, tcfg.lrate_rgbnet, False) for p in t_mlp]
    )

    # framework side: the production train step over the production forward.
    # cfg changes at the pg boundary, so forward/step/geom are (re)builders
    # exactly like loop.py's compile_step re-jit boundary.
    def make_fwd(cfg_now):
        def fwd(p, ro, rd, vd, key, img_index=None):
            return fg.forward(p, cfg_now, ro, rd, vd, bg=bg)

        return fwd

    def make_step(cfg_now, anchor):
        return jax.jit(make_train_step(
            make_fwd(cfg_now), tcfg,
            world_size_max=float(max(cfg_now.world_size)), lr_anchor=anchor,
        ))

    # shared sample geometry: contracted points from the production sampler
    # (contraction parity is gated separately in tests/test_ops_golden.py;
    # sharing isolates the trajectory to banks/scan/head/losses/optimizer)
    def make_geom(cfg_now):
        return jax.jit(lambda ro, rd: fg.sample_ray(cfg_now, ro, rd)[:3:2])

    anchor = 1
    step_fn = make_step(cfg, anchor)
    state = create_train_state(params, tcfg)
    geom = make_geom(cfg)
    half_extent = 1.0 + cfg.bg_len
    act_shift = float(cfg.act_shift)
    ws_max = float(max(cfg.world_size))

    rng = np.random.default_rng(42)
    t0 = time.time()
    for step in range(1, steps + 1):
        if pg_boundary is not None and step == pg_boundary:
            # the production boundary block (train/loop.py pg_scale):
            # resample grids + occupancy refresh, act_shift decay, optimizer
            # rebuilt from scratch, lr decay re-anchored, step re-jitted
            new_params, cfg = fg.scale_volume_grid(
                state.params, cfg, 24**3, 24**3
            )
            new_params = new_params.replace(
                act_shift=new_params.act_shift - tcfg.decay_after_scale
            )
            state = create_train_state(new_params, tcfg, start_step=step - 1)
            anchor = step
            step_fn = make_step(cfg, anchor)
            geom = make_geom(cfg)
            interval = cfg.stepsize * cfg.voxel_size_ratio_density
            ws_max = float(max(cfg.world_size))

            # torch mirror of the same boundary
            t_d = _torch_resize_banks(t_d, cfg.world_size_density)
            t_k = _torch_resize_banks(t_k, cfg.world_size_rgb)
            act_shift -= float(tcfg.decay_after_scale)
            opt = _TorchMaskedAdam(
                [(t_d, tcfg.lrate_density, True), (t_k, tcfg.lrate_k0, True)]
                + [(p, tcfg.lrate_rgbnet, False) for p in t_mlp]
            )
        idx = rng.integers(0, RO.shape[0], size=n_rand)
        batch = {
            "rgb": jnp.asarray(GT[idx]),
            "rays_o": jnp.asarray(RO[idx]),
            "rays_d": jnp.asarray(RD[idx]),
            "viewdirs": jnp.asarray(VD[idx]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))

        pts, tvals = geom(batch["rays_o"], batch["rays_d"])
        tgt = torch.tensor(GT[idx])
        out = _torch_fg_forward(
            t_d, t_k, t_mlp, torch.tensor(np.asarray(pts)),
            torch.tensor(VD[idx]), act_shift, float(interval),
            cfg.viewbase_pe, bg, half_extent, cfg.fourier_freq_num,
            full_output=loss_zoo,
        )
        if loss_zoo:
            rgb_m, w_t, ainv_t, rgb_raw = out
            S = w_t.shape[-1]
            mse_t = ((rgb_m - tgt) ** 2).mean()
            p = torch.clamp(ainv_t, 1e-6, 1.0 - 1e-6)
            ent = -(p * torch.log(p) + (1 - p) * torch.log(1 - p)).mean()
            per = ((rgb_raw - tgt[:, None, :]) ** 2).sum(-1)
            rgbper_l = (per * w_t.detach()).sum() / n_rand
            s2 = (1.0 - 1.0 / (1.0 + torch.tensor(np.asarray(tvals))))[
                None, :
            ].expand_as(w_t)
            w_pre = torch.cumsum(w_t, -1) - w_t
            ws_pre = torch.cumsum(w_t * s2, -1) - w_t * s2
            dist = (
                (2 * w_t * (s2 * w_pre - ws_pre)).sum()
                + ((1.0 / 3.0) * (1.0 / S) * w_t**2).sum()
            ) / n_rand
            loss_t = (
                mse_t
                + tcfg.weight_entropy_last * ent
                + tcfg.weight_rgbper * rgbper_l
                + tcfg.weight_distortion * dist
            )
        else:
            loss_t = ((out - tgt) ** 2).mean()
        loss_t.backward()
        if loss_zoo:
            # TV gradient injection between backward and the optimizer step
            # (run_train.py:281-287 / train/step.py add_tv_grads)
            gate = (
                step < tcfg.tv_before
                and step > tcfg.tv_after
                and step % tcfg.tv_every == 0
            )
            dense = step < tcfg.tv_dense_before
            if gate:
                with torch.no_grad():
                    for par, weight in (
                        (t_d, tcfg.weight_tv_density),
                        (t_k, tcfg.weight_tv_k0),
                    ):
                        bw = weight / n_rand * ws_max / 128.0
                        par.grad += _torch_tv_grad(
                            par, bw, bw, bw, dense, par.grad
                        )
        # lr decay re-anchors at the pg boundary (optimizer rebuilt with
        # global_step=0, run_train.py:199)
        opt.step(float(lr_decay_scale(max(step - anchor, 0), tcfg.lrate_decay)))
        if step % 50 == 0 or step == steps:
            mse_log = float((mse_t if loss_zoo else loss_t).detach())
            log(
                f"step {step:4d}: jax psnr "
                f"{float(metrics['psnr']):5.2f} / torch mse->psnr "
                f"{-10 * np.log10(mse_log):5.2f} "
                f"({time.time() - t0:5.1f}s)"
            )

    eval_idx = np.random.default_rng(7).integers(0, RO.shape[0], size=4096)
    res = make_fwd(cfg)(state.params, jnp.asarray(RO[eval_idx]),
                        jnp.asarray(RD[eval_idx]), jnp.asarray(VD[eval_idx]),
                        None)
    mse_j = float(jnp.mean((res.rgb_marched - jnp.asarray(GT[eval_idx])) ** 2))
    pts, _ = geom(jnp.asarray(RO[eval_idx]), jnp.asarray(RD[eval_idx]))
    with torch.no_grad():
        rgb_t = _torch_fg_forward(
            t_d, t_k, t_mlp, torch.tensor(np.asarray(pts)),
            torch.tensor(VD[eval_idx]), act_shift, float(interval),
            cfg.viewbase_pe, bg, half_extent, cfg.fourier_freq_num,
        )
        mse_e = float(((rgb_t - torch.tensor(GT[eval_idx])) ** 2).mean())
    psnr_j = -10 * np.log10(mse_j)
    psnr_t = -10 * np.log10(mse_e)
    delta = abs(psnr_j - psnr_t)
    out = {
        "model": "fourier_grid",
        "loss_zoo": loss_zoo,
        "pg_boundary": pg_boundary,
        "psnr_torch": round(psnr_t, 3),
        "psnr_jax": round(psnr_j, 3),
        "delta_db": round(delta, 4),
        "steps": steps,
    }
    log(json.dumps(out))
    assert delta <= tol_db, (
        f"fourier trajectory parity FAILED: |{psnr_j:.3f} - {psnr_t:.3f}| = "
        f"{delta:.3f} dB > {tol_db} dB"
    )
    return out


# ---------------------------------------------------------------------------
# real-data runs
# ---------------------------------------------------------------------------

_SCENES = {
    # scene -> (config path, dataset probe, expected PSNR, reference source)
    "lego": ("configs/nerf/lego.py", "nerf_synthetic/lego",
             None, "DVGO-class bounded sanity scene"),
    "garden": ("configs/nerf_unbounded/garden_single.py", "360_v2/garden",
               28.98, "README.md:27 (Mip-NeRF-360 avg)"),
    "truck": ("configs/tankstemple_unbounded/truck_single.py",
              "tanks_and_temples/tat_training_Truck",
              20.85, "README.md:22 (unbounded T&T avg)"),
}


def run_real(data_root: str, scenes, log=print, quick: bool = False,
             work_dir: str | None = None) -> int:
    """Run the reference benchmark configs end-to-end on on-disk datasets.

    ``quick=True`` is the dress-rehearsal mode (VERDICT r3 #8): the SAME
    entry path (config load -> load_everything -> run_train -> render_test)
    but through a derived config that shrinks iteration counts/grids — used
    with ``data.synthetic.write_fake_360_scene`` to prove the first machine
    with real data can run the full pipeline unmodified."""
    import os
    import tempfile

    failures = 0
    for scene in scenes:
        config, probe, expect, src = _SCENES[scene]
        if not os.path.exists(os.path.join(data_root, probe)):
            log(f"{scene}: dataset missing ({data_root}/{probe}) — run "
                f"tools/fetch_data.py first; skipping")
            failures += 1
            continue
        from unboundednerfpytorch_tpu.cli.main import main as cli_main

        run_config = config
        if quick:
            wd = work_dir or tempfile.mkdtemp(prefix="parity_quick_")
            os.makedirs(wd, exist_ok=True)
            abs_base = os.path.abspath(config)
            run_config = os.path.join(wd, f"quick_{scene}.py")
            with open(run_config, "w") as f:
                f.write(f"""\
_base_ = {abs_base!r}
expname = 'dress_rehearsal_{scene}'
basedir = {os.path.join(wd, 'logs')!r}
data = dict(datadir={os.path.join(data_root, probe)!r})
fine_train = dict(N_iters=60, N_rand=512, pg_scale=[15, 30],
                  tv_before=50, tv_dense_before=50)
coarse_train = dict(N_iters=0)
fine_model_and_render = dict(
    num_voxels_density=32**3, num_voxels_rgb=32**3,
    num_voxels_base_density=32**3, num_voxels_base_rgb=32**3,
    fast_color_thres={{'_delete_': True, 0: 5e-6, 20: 1e-4}},
)
""")
        log(f"{scene}: training {run_config} (expected ~{expect} dB, {src})")
        rc = cli_main(["--config", run_config, "--program", "train",
                       "--render_test"])
        failures += rc != 0
    return failures


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="PSNR parity harness")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--tol_db", type=float, default=0.1)
    ap.add_argument("--real", action="store_true")
    ap.add_argument("--model", default="dvgo",
                    choices=["dvgo", "fourier", "dmpigo"],
                    help="trajectory-parity recipe: dvgo (bounded), fourier "
                         "(flagship contracted FourierGrid), or dmpigo "
                         "(forward-facing NDC MPI)")
    ap.add_argument("--loss_zoo", action="store_true",
                    help="fourier only: enable entropy/rgbper/distortion "
                         "losses + TV gradient injection on both sides")
    ap.add_argument("--pg_boundary", type=int, default=None,
                    help="fourier only: cross a progressive-upsampling "
                         "boundary at this step (resample + optimizer "
                         "rebuild + act_shift decay + lr re-anchor)")
    ap.add_argument("--pervoxel_lr", action="store_true",
                    help="dvgo only: per-voxel learning rate from view "
                         "counts (adam_upd_with_perlr path)")
    ap.add_argument("--data_root", default="data")
    ap.add_argument("--quick", action="store_true",
                    help="--real dress-rehearsal: same entry path, derived "
                         "tiny config (pairs with "
                         "data.synthetic.write_fake_360_scene)")
    ap.add_argument("--scenes", nargs="*", default=["lego", "garden", "truck"],
                    choices=sorted(_SCENES))
    args = ap.parse_args(argv)
    if args.real:
        return run_real(args.data_root, args.scenes, quick=args.quick)
    if args.model == "fourier":
        run_trajectory_parity_fourier(args.steps, args.n_rand, args.tol_db,
                                      loss_zoo=args.loss_zoo,
                                      pg_boundary=args.pg_boundary)
    elif args.model == "dmpigo":
        run_trajectory_parity_dmpigo(args.steps, args.n_rand, args.tol_db)
    else:
        run_trajectory_parity(args.steps, args.n_rand, args.tol_db,
                              pervoxel_lr=args.pervoxel_lr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
