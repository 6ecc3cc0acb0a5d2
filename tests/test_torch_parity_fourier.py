"""Parity gate for the flagship FourierGrid model: pixels + grid gradients
allclose vs an independent torch implementation of the Fourier-bank query
(per-bank embedded grid_sample, mean-reduced — FourierGrid_grid.py:60-78)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.configs.schema import ModelRenderConfig
from unboundednerfpytorch_tpu.models import fourier_grid as fg


def torch_fourier_query(grid_bxyzc, xyz_norm_m11, num_freqs):
    """grid [B,X,Y,Z,C]; xyz_norm_m11 [M,3] in [-1,1] (already flipped-order
    agnostic: we apply the torch zyx flip internally like the reference)."""
    B = grid_bxyzc.shape[0]
    C = grid_bxyzc.shape[-1]
    M = xyz_norm_m11.shape[0]
    # reference embedding on the FLIPPED coords: ind_norm flipped then embedded
    ind = xyz_norm_m11.flip(-1)  # zyx order, [-1,1]
    freqs = 2 ** torch.arange(num_freqs, dtype=torch.float32)
    banks = [ind]
    for k in range(num_freqs):
        banks.append(torch.sin(freqs[k] * ind))
        banks.append(torch.cos(freqs[k] * ind))
    out = 0
    g = grid_bxyzc.permute(0, 4, 1, 2, 3)  # [B,C,X,Y,Z]
    for b in range(B):
        coords = banks[b].reshape(1, 1, 1, M, 3)
        v = F.grid_sample(g[b : b + 1], coords, mode="bilinear", align_corners=True)
        out = out + v.reshape(C, M).T
    return out / B


def test_fourier_bank_query_matches_torch():
    rng = np.random.RandomState(0)
    K = 2
    B = 2 * K + 1
    X = Y = Z = 9
    C = 4
    grid = rng.randn(B, X, Y, Z, C).astype(np.float32)
    xyz = rng.uniform(-2.0, 2.0, (200, 3)).astype(np.float32)  # world, bbox ±2

    from unboundednerfpytorch_tpu.fields.grids import FourierGrid

    fgrid = FourierGrid(
        grid=jnp.asarray(grid), xyz_min=(-2.0, -2.0, -2.0),
        xyz_max=(2.0, 2.0, 2.0), num_freqs=K,
    )
    got = np.asarray(fgrid(jnp.asarray(xyz)))

    # torch side: reference embeds the FLIPPED normalized coords and samples
    # torch-layout [B,C,X,Y,Z] grids whose last axis is Z. grid_sample's x
    # coordinate indexes the LAST axis, so feeding the embedded zyx vector
    # reproduces xyz-major indexing of our [X,Y,Z] layout.
    norm = torch.tensor(xyz) / 2.0  # [-1,1]
    ref = torch_fourier_query(torch.tensor(grid), norm, K).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fourier_model_pixels_and_grads_match_torch_banks():
    """End-to-end FourierGrid forward: compare density/k0 gradient flow by
    rendering with the JAX model and recomputing the per-sample field values
    in torch from the same sampled points."""
    rng = np.random.RandomState(1)
    mr = ModelRenderConfig(
        num_voxels_rgb=12**3, num_voxels_density=12**3,
        num_voxels_base_rgb=12**3, num_voxels_base_density=12**3,
        rgbnet_dim=4, alpha_init=1e-2, fast_color_thres=0.0,
        fourier_freq_num=2, bg_len=0.2, stepsize=1.0,
    )
    cfg = fg.config_from(mr, (-3, -3, -3), (3, 3, 3), 12**3, 12**3)
    params = fg.create(cfg, jax.random.PRNGKey(0))
    Bd = params.density.grid.shape[0]
    dgrid = (rng.randn(*params.density.grid.shape) * 0.5).astype(np.float32)
    kgrid = (rng.randn(*params.k0.grid.shape) * 0.3).astype(np.float32)
    params = params.replace(
        density=params.density.replace(grid=jnp.asarray(dgrid)),
        k0=params.k0.replace(grid=jnp.asarray(kgrid)),
    )

    N = 8
    rays_o = jnp.asarray(rng.uniform(2.0, 3.0, (N, 3)).astype(np.float32))
    rays_d = jnp.asarray((-rng.uniform(0.5, 1.5, (N, 3))).astype(np.float32))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    res = fg.forward(params, cfg, rays_o, rays_d, viewdirs, bg=1.0)

    # recompute density at the sampled (contracted) points with torch banks
    pts, inner, t = fg.sample_ray(cfg, rays_o, rays_d)
    mn = np.asarray(cfg.xyz_min, np.float32)
    mx = np.asarray(cfg.xyz_max, np.float32)
    norm = (np.asarray(pts).reshape(-1, 3) - mn) / (mx - mn) * 2 - 1
    d_torch = torch_fourier_query(
        torch.tensor(dgrid), torch.tensor(norm), cfg.fourier_freq_num
    ).numpy()[:, 0].reshape(N, -1)
    np.testing.assert_allclose(
        np.asarray(res.raw_density), d_torch, rtol=2e-4, atol=2e-5
    )
    # alpha/weights conservation sanity
    total = np.asarray(res.weights).sum(-1) + np.asarray(res.alphainv_last)
    assert np.all(total < 1 + 1e-4) and np.all(total > 1 - 2e-3)
