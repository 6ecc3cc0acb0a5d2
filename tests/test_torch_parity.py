"""The BASELINE parity gate: rendered pixels AND pixel gradients of the DVGO
forward must be allclose to an independent PyTorch implementation of the same
math (torch F.grid_sample + sequential transmittance scan + torch autograd),
mirroring how the reference computes them (dvgo.py forward + CUDA kernels)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models import dvgo


def torch_dvgo_forward(density_grid, k0_grid, mlp_params, pts, mask, viewdirs,
                       act_shift, interval, viewbase_pe, bg):
    """Reference-math DVGO forward in torch (independent implementation).

    density_grid [X,Y,Z,1], k0_grid [X,Y,Z,C] (channel-last, converted
    internally to torch layout); pts [N,S,3] normalized to [0,1]^3 coords
    of the grid; mask [N,S]."""
    N, S, _ = pts.shape

    def sample(grid_xyzc, coords01):
        g = grid_xyzc.permute(3, 0, 1, 2)[None]  # [1,C,X,Y,Z]
        ind = coords01.reshape(1, 1, 1, -1, 3).flip(-1) * 2 - 1
        out = F.grid_sample(g, ind, mode="bilinear", align_corners=True)
        return out.reshape(g.shape[1], -1).T.reshape(N, S, g.shape[1])

    density = sample(density_grid, pts)[..., 0]
    e = torch.exp(density + act_shift)
    alpha = 1.0 - torch.pow(1.0 + e, -interval)
    alpha = torch.where(mask, alpha, torch.zeros_like(alpha))

    # sequential per-ray scan with the CUDA early exit (emit, update, break)
    weights = torch.zeros_like(alpha)
    alphainv = torch.ones(N, dtype=alpha.dtype)
    for r in range(N):
        T = torch.ones(())
        for s in range(S):
            weights[r, s] = T * alpha[r, s]
            T = T * (1 - alpha[r, s])
            if float(T) < 1e-3:
                break
        alphainv[r] = T

    k0 = sample(k0_grid, pts)
    freqs = 2 ** torch.arange(viewbase_pe, dtype=torch.float32)
    emb = (viewdirs[..., None] * freqs).reshape(N, -1)
    vemb = torch.cat([viewdirs, emb.sin(), emb.cos()], -1)
    feat = torch.cat(
        [k0, vemb[:, None, :].expand(N, S, vemb.shape[-1])], -1
    )
    h = feat
    n_layers = len(mlp_params) // 2
    for i in range(n_layers):
        h = h @ mlp_params[2 * i] + mlp_params[2 * i + 1]
        if i < n_layers - 1:
            h = torch.relu(h)
    rgb = torch.sigmoid(h)

    rgb_marched = torch.einsum("ns,nsc->nc", weights, rgb) + alphainv[:, None] * bg
    return rgb_marched, weights, alphainv


@pytest.mark.slow
def test_dvgo_forward_and_pixel_grads_match_torch():
    rng = np.random.RandomState(0)
    C = 6
    N, = (12,)
    cfg = dvgo.DVGOConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
        num_voxels=12**3, num_voxels_base=12**3,
        rgbnet_dim=C, rgbnet_direct=True, rgbnet_depth=3, rgbnet_width=16,
        alpha_init=1e-2, fast_color_thres=0.0,
    )
    X, Y, Z = cfg.world_size  # int truncation matches the reference .long()
    params = dvgo.create(cfg, jax.random.PRNGKey(0))
    dgrid = rng.randn(X, Y, Z, 1).astype(np.float32)
    kgrid = rng.randn(X, Y, Z, C).astype(np.float32) * 0.5
    params = params.replace(
        density=params.density.replace(grid=jnp.asarray(dgrid)),
        k0=params.k0.replace(grid=jnp.asarray(kgrid)),
    )

    rays_o = jnp.asarray(rng.uniform(1.8, 2.5, (N, 3)).astype(np.float32))
    rays_d = jnp.asarray((-rng.uniform(0.5, 1.5, (N, 3))).astype(np.float32))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, stepsize, bg = 0.2, 0.5, 1.0

    # --- JAX forward + grads
    def render(dg, kg):
        p = params.replace(
            density=params.density.replace(grid=dg),
            k0=params.k0.replace(grid=kg),
        )
        res = dvgo.forward(p, cfg, rays_o, rays_d, viewdirs,
                           near=near, stepsize=stepsize, bg=bg)
        return res.rgb_marched

    rgb_jax = render(jnp.asarray(dgrid), jnp.asarray(kgrid))
    cot = rng.randn(N, 3).astype(np.float32)
    gd_jax, gk_jax = jax.grad(
        lambda dg, kg: jnp.sum(render(dg, kg) * cot), argnums=(0, 1)
    )(jnp.asarray(dgrid), jnp.asarray(kgrid))

    # --- torch forward + grads on identical inputs
    from unboundednerfpytorch_tpu.ops import sampling as S_ops

    interval = stepsize * cfg.voxel_size_ratio
    samples = S_ops.sample_pts_on_rays(
        rays_o, rays_d, jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max),
        near, stepsize * cfg.voxel_size, dvgo.n_samples(cfg, stepsize),
    )
    pts01 = (np.asarray(samples.pts) - np.asarray(cfg.xyz_min)) / (
        np.asarray(cfg.xyz_max) - np.asarray(cfg.xyz_min)
    )
    t_pts = torch.tensor(pts01.astype(np.float32))
    t_mask = torch.tensor(np.asarray(samples.mask))
    t_d = torch.tensor(dgrid, requires_grad=True)
    t_k = torch.tensor(kgrid, requires_grad=True)
    mlp_flat = []
    for w, b in zip(params.rgbnet.weights, params.rgbnet.biases):
        mlp_flat += [torch.tensor(np.asarray(w)), torch.tensor(np.asarray(b))]
    t_vd = torch.tensor(np.asarray(viewdirs))

    rgb_t, w_t, ai_t = torch_dvgo_forward(
        t_d, t_k, mlp_flat, t_pts, t_mask, t_vd,
        float(cfg.act_shift), float(interval), cfg.viewbase_pe, bg,
    )
    (rgb_t * torch.tensor(cot)).sum().backward()

    # pixels tight, gradients slightly looser (fp32 reduction order)
    np.testing.assert_allclose(
        np.asarray(rgb_jax), rgb_t.detach().numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gd_jax)[..., 0], t_d.grad.numpy()[..., 0], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gk_jax), t_k.grad.numpy(), rtol=1e-3, atol=1e-4
    )
