"""Block-NeRF end-to-end quality gate (VERDICT r3 next-round #4).

Drives the FULL Block-NeRF pipeline on a synthetic 2-block street scene:
per-block training (hierarchical IPE renderer + exposure + appearance
conditioning + visibility distillation), then composed inference on overlap
views — per-block renders, the mean-visibility gate, inverse-distance
weighting (`/root/reference/eval_block_nerf.py:188-225` semantics) — and
produces a composed-frame PSNR.

An INDEPENDENT torch mirror of the composed-eval path (IPE cone encoding,
skip MLP, visibility MLP, deterministic PDF resampling, cumprod
compositing, visibility gate + IDW merge, uint8 quantization) re-renders
the same trained parameters; the gate asserts the two composed PSNRs agree
within tolerance — pinning the eval math, not just unit pieces.

  python tools/block_nerf_e2e.py [--steps 2500] [--out runs/block_e2e.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# toy-scale model (the reference trains D=8/W=256 for days; the gate needs
# convergence in minutes — D=4 keeps the skip list (4,) inert by design)
MODEL_KW = dict(D=4, W=128, vis_width=64, appearance_dim=8,
                xyz_freqs=8, dir_freqs=4, exposure_freqs=4)
RENDER_KW = dict(n_samples=32, n_importance=32, use_disp=False,
                 xyz_freqs=8, dir_freqs=4, exposure_freqs=4)


def build_scene(n_views: int = 14, H: int = 36, W: int = 48):
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.models.block_nerf import dataset as D

    views, images = synthetic.make_street_scene(n_views=n_views, H=H, W=W)
    split = synthetic.split_street_blocks(views)
    name_to_idx = {v["image_name"]: i for i, v in enumerate(views)}

    stores = {}
    for block, info in split.items():
        rays_l, rgbs_l, ts_l = [], [], []
        for img_name, app_id in info["elements"]:
            i = name_to_idx[img_name]
            rays, rgbs, ts, _ = D.build_image_rays(
                views[i], images[i], app_id, img_downscale=1,
                near=0.05, far=14.0,
            )
            rays_l.append(rays)
            rgbs_l.append(rgbs)
            ts_l.append(ts)
        stores[block] = {
            "rays": np.concatenate(rays_l),
            "rgbs": np.concatenate(rgbs_l),
            "ts": np.concatenate(ts_l),
        }
    return views, images, split, stores, name_to_idx


def train_all_blocks(split, stores, n_images, steps: int, log=print):
    import jax
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.models.block_nerf import model as M
    from unboundednerfpytorch_tpu.models.block_nerf import training as T

    block_params = {}
    for bi, (block, store) in enumerate(sorted(stores.items())):
        params = M.create(jax.random.PRNGKey(10 + bi), n_appearance=n_images,
                          **MODEL_KW)
        tx = T.make_optimizer(5e-4, decay_steps=max(steps, 1))
        state = T.BlockTrainState(
            params=params, opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        t0 = time.time()
        state, metrics = T.train_block(
            state, {k: jnp.asarray(v) for k, v in store.items()},
            n_steps=steps, batch_size=1024, key=jax.random.PRNGKey(bi),
            log_every=max(steps // 4, 1), log_fn=log,
            n_samples=RENDER_KW["n_samples"],
            n_importance=RENDER_KW["n_importance"],
            use_disp=RENDER_KW["use_disp"],
            xyz_freqs=RENDER_KW["xyz_freqs"],
            dir_freqs=RENDER_KW["dir_freqs"],
            exposure_freqs=RENDER_KW["exposure_freqs"],
        )
        log(f"{block}: trained {steps} steps in {time.time() - t0:.0f}s "
            f"(psnr {float(metrics['psnr']):.2f})")
        block_params[block] = jax.device_get(state.params)
    return block_params


def compose_eval(views, images, split, block_params, name_to_idx, log=print):
    """Composed-frame PSNR over the overlap views (in BOTH blocks)."""
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.models.block_nerf import compose as C
    from unboundednerfpytorch_tpu.models.block_nerf import dataset as D

    centroids = {b: info["centroid"] for b, info in split.items()}
    in_both = [
        name for name in (v["image_name"] for v in views)
        if len(C.filter_blocks(name, split)) == 2
    ]
    psnrs = []
    per_view = {}
    for name in in_both:
        i = name_to_idx[name]
        H, W = int(views[i]["H"]), int(views[i]["W"])
        rays, _, ts, _ = D.build_image_rays(
            views[i], None, i, img_downscale=1, near=0.05, far=14.0
        )
        cand = C.filter_blocks(name, split)
        rgb_imgs, _ = C.compose_view(
            block_params, cand, centroids, jnp.asarray(rays),
            jnp.asarray(ts), H, W, chunk=2048, **RENDER_KW,
        )
        if rgb_imgs is None:
            log(f"{name}: ALL candidate blocks failed the visibility gate")
            continue
        pred = rgb_imgs["compose"].astype(np.float32) / 255.0
        gt = images[i]
        mse = float(np.mean((pred - gt) ** 2))
        psnr = -10 * np.log10(mse)
        per_view[name] = psnr
        psnrs.append(psnr)
    return float(np.mean(psnrs)), per_view


# ---------------------------------------------------------------------------
# torch mirror of the composed eval (eval_block_nerf.py:188-225)
# ---------------------------------------------------------------------------


def _t(x):
    import torch

    return torch.tensor(np.asarray(x, np.float32))


def _torch_mlp(mlp, x, relu_last=False):
    import torch

    n = len(mlp.weights)
    for i in range(n):
        x = x @ _t(mlp.weights[i]) + _t(mlp.biases[i])
        if i < n - 1 or relu_last:
            x = torch.relu(x)
    return x


def _torch_pos_embedding(x, n_freqs):
    import torch

    out = []
    for k in range(n_freqs):
        f = 2.0**k
        out.append(torch.sin(f * x))
        out.append(torch.cos(f * x))
    return torch.cat(out, -1)


def _torch_ipe(mu, diag_cov, n_freqs):
    import torch

    out = []
    for k in range(n_freqs):
        f = 2.0**k
        damp = torch.exp(-0.5 * (f * f) * diag_cov)
        out.append(torch.sin(f * mu) * damp)
        out.append(torch.cos(f * mu) * damp)
    return torch.cat(out, -1)


def _torch_cone(z, ro, rd, radii):
    t0, t1 = z[..., :-1], z[..., 1:]
    mid, diff = (t0 + t1) / 2, (t1 - t0) / 2
    denom = 3 * mid**2 + diff**2
    mean_t = mid + (2 * mid * diff**2) / denom
    var_t = diff**2 / 3 - (4 / 15) * (
        diff**4 * (12 * mid**2 - diff**2) / denom**2
    )
    radii = radii.reshape(-1, 1)
    var_r = radii**2 * (
        mid**2 / 4 + (5 / 12) * diff**2 - (4 / 15) * diff**4 / denom
    )
    mean = ro[:, None, :] + rd[:, None, :] * mean_t[..., None]
    dod = rd**2
    dnorm = dod.sum(-1, keepdim=True) + 1e-10
    diag_cov = (
        var_t[..., None] * dod[:, None, :]
        + var_r[..., None] * (1 - dod / dnorm)[:, None, :]
    )
    return mean_t, mean, diag_cov


def _torch_apply(params, xyz_enc, dir_enc, exp_enc, app_enc, skips=(4,)):
    import torch

    x = xyz_enc
    for i in range(len(params.xyz_layers.weights)):
        if i in skips:
            x = torch.cat([x, xyz_enc], -1)
        x = torch.relu(
            x @ _t(params.xyz_layers.weights[i]) + _t(params.xyz_layers.biases[i])
        )
    sigma = torch.nn.functional.softplus(_torch_mlp(params.sigma_head, x))[..., 0]
    feat = _torch_mlp(params.xyz_final, x)
    h = torch.cat([feat, dir_enc, exp_enc, app_enc], -1)
    h = torch.relu(_torch_mlp(params.dir_layers, h))
    rgb = torch.sigmoid(_torch_mlp(params.rgb_head, h))
    return rgb, sigma


def _torch_vis(params, xyz_enc, dir_enc):
    import torch

    h = torch.relu(
        _torch_mlp(params.vis_layers, torch.cat([xyz_enc, dir_enc], -1))
    )
    return torch.nn.functional.softplus(_torch_mlp(params.vis_head, h))[..., 0]


def _torch_sample_pdf(bins, weights, n_importance, alpha=1e-2):
    import torch

    n_rays, n_bins = weights.shape
    weights = weights + alpha
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n_importance + 1).expand(n_rays, -1)
    inds = (cdf[:, None, :] <= u[:, :, None]).sum(-1)
    below = (inds - 1).clamp(0, n_bins)
    above = inds.clamp(0, n_bins)
    cdf_lo = torch.gather(cdf, 1, below)
    cdf_hi = torch.gather(cdf, 1, above)
    bins_pad = torch.cat([bins, bins[:, -1:]], -1)
    bin_lo = torch.gather(bins_pad, 1, below.clamp(0, n_bins - 1))
    bin_hi = torch.gather(bins_pad, 1, above.clamp(0, n_bins - 1))
    denom = cdf_hi - cdf_lo
    denom = torch.where(denom < alpha, torch.ones_like(denom), denom)
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)


def _torch_volume(rgbs, sigmas, z, mean_t):
    import torch

    deltas = z[:, 1:] - z[:, :-1]
    alphas = 1.0 - torch.exp(-deltas * torch.relu(sigmas))
    shifted = torch.cat(
        [torch.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], -1
    )
    Ti = torch.cumprod(shifted[:, :-1], -1)
    weights = alphas * Ti
    rgb = torch.einsum("ns,nsc->nc", weights, rgbs)
    depth = (weights * mean_t).sum(-1)
    return rgb, depth, weights, Ti


def torch_render_block(params, rays, ts, n_samples, n_importance, use_disp,
                       xyz_freqs, dir_freqs, exposure_freqs):
    """The test-path render of one block in torch (rendering.py:99-183 with
    key=None): deterministic z, coarse level, PDF resample, fine level."""
    import torch

    rays = _t(rays)
    ts = torch.tensor(np.asarray(ts, np.int64))
    ro, rd = rays[:, :3], rays[:, 3:6]
    radii, exposure = rays[:, 6:7], rays[:, 7:8]
    near, far = rays[:, 8:9], rays[:, 9:10]
    n_rays = rays.shape[0]

    z_steps = torch.linspace(0.0, 1.0, n_samples + 1)
    if use_disp:
        z = torch.exp(torch.log(near) * (1 - z_steps) + torch.log(far) * z_steps)
    else:
        z = near * (1 - z_steps) + far * z_steps
    z = z.expand(n_rays, n_samples + 1)

    dir_enc1 = _torch_pos_embedding(rd, dir_freqs)
    exp_enc1 = _torch_pos_embedding(exposure, exposure_freqs)
    app = _t(params.appearance)[ts]

    def level(zv):
        s = zv.shape[1] - 1
        mean_t, mean, cov = _torch_cone(zv, ro, rd, radii[:, 0])
        xyz_enc = _torch_ipe(mean, cov, xyz_freqs)
        tile = lambda e: e[:, None, :].expand(n_rays, s, e.shape[-1])
        rgb, sigma = _torch_apply(
            params, xyz_enc, tile(dir_enc1), tile(exp_enc1), tile(app)
        )
        vis = _torch_vis(params, xyz_enc, tile(dir_enc1))
        return _torch_volume(rgb, sigma, zv, mean_t) + (vis,)

    with torch.no_grad():
        rgb_c, _, w_c, _, _ = level(z)
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        z_new = _torch_sample_pdf(z_mid, w_c[:, 1:-1], n_importance)
        z_fine, _ = torch.sort(torch.cat([z, z_new], -1), -1)
        rgb_f, depth_f, _, _, vis_f = level(z_fine)
    return (rgb_f.numpy(), depth_f.numpy(), vis_f.mean(-1).numpy())


def torch_compose_eval(views, images, split, block_params, name_to_idx,
                       log=print):
    """The composed eval in torch: per-block render, visibility gate, IDW,
    uint8 quantization — mirroring compose.compose_view bit-for-bit."""
    from unboundednerfpytorch_tpu.models.block_nerf import compose as C
    from unboundednerfpytorch_tpu.models.block_nerf import dataset as D

    centroids = {b: info["centroid"] for b, info in split.items()}
    in_both = [
        name for name in (v["image_name"] for v in views)
        if len(C.filter_blocks(name, split)) == 2
    ]
    psnrs, per_view = [], {}
    for name in in_both:
        i = name_to_idx[name]
        H, W = int(views[i]["H"]), int(views[i]["W"])
        rays, _, ts, _ = D.build_image_rays(
            views[i], None, i, img_downscale=1, near=0.05, far=14.0
        )
        origin = rays[0, :3]
        results = {}
        for block in C.filter_blocks(name, split):
            rgb, depth, vis = torch_render_block(
                block_params[block], rays, ts, **RENDER_KW
            )
            if float(vis.mean()) <= C.VISIBILITY_GATE:
                continue
            results[block] = {
                "rgb_fine": rgb, "depth_fine": depth,
                "distance_weight": C.distance_weight(
                    origin, centroids[block], p=4
                ),
            }
        if not results:
            continue
        rgb_imgs, _ = C.inverse_interpolation(results, H, W)
        pred = rgb_imgs["compose"].astype(np.float32) / 255.0
        mse = float(np.mean((pred - images[i]) ** 2))
        psnr = -10 * np.log10(mse)
        per_view[name] = psnr
        psnrs.append(psnr)
    return float(np.mean(psnrs)), per_view


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--n_views", type=int, default=14)
    ap.add_argument("--H", type=int, default=36)
    ap.add_argument("--W", type=int, default=48)
    ap.add_argument("--out", default="runs/block_e2e.json")
    ap.add_argument("--tol_db", type=float, default=0.05)
    ap.add_argument("--min_psnr", type=float, default=0.0)
    args = ap.parse_args(argv)

    views, images, split, stores, name_to_idx = build_scene(
        args.n_views, args.H, args.W
    )
    n_images = len(views)
    print({b: len(v["elements"]) for b, v in split.items()})
    block_params = train_all_blocks(split, stores, n_images, args.steps)

    psnr_jax, per_view = compose_eval(
        views, images, split, block_params, name_to_idx
    )
    print(f"composed PSNR (framework): {psnr_jax:.3f} dB {per_view}")
    psnr_torch, per_view_t = torch_compose_eval(
        views, images, split, block_params, name_to_idx
    )
    print(f"composed PSNR (torch mirror): {psnr_torch:.3f} dB")

    delta = abs(psnr_jax - psnr_torch)
    result = {
        "composed_psnr_framework": round(psnr_jax, 3),
        "composed_psnr_torch_mirror": round(psnr_torch, 3),
        "delta_db": round(delta, 4),
        "per_view": {k: round(v, 3) for k, v in per_view.items()},
        "steps": args.steps,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert delta <= args.tol_db, (
        f"composed-eval mirror mismatch: {delta:.4f} dB > {args.tol_db}"
    )
    assert psnr_jax >= args.min_psnr, (
        f"composed PSNR {psnr_jax:.2f} < {args.min_psnr}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
