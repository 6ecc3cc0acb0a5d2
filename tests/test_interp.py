"""Golden tests: trilinear interpolation vs torch.nn.functional.grid_sample.

The reference DenseGrid query is F.grid_sample(grid[1,C,X,Y,Z], zyx-flipped
normalized coords, bilinear, align_corners=True); our grid_sample_3d must
match it bitwise-closely, including out-of-range zero padding and the
scatter-add backward.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import interp


def torch_dense_grid_query(grid_xyzc, xyz, xyz_min, xyz_max):
    """The reference DenseGrid.forward (grid.py:50-61) on a [X,Y,Z,C] grid."""
    g = torch.from_numpy(np.moveaxis(grid_xyzc, -1, 0)[None])  # [1,C,X,Y,Z]
    pts = torch.from_numpy(xyz).reshape(1, 1, 1, -1, 3)
    mn = torch.tensor(xyz_min)
    mx = torch.tensor(xyz_max)
    ind_norm = ((pts - mn) / (mx - mn)).flip((-1,)) * 2 - 1
    out = F.grid_sample(g, ind_norm, mode="bilinear", align_corners=True)
    C = grid_xyzc.shape[-1]
    return out.reshape(C, -1).T.numpy()


@pytest.mark.parametrize("shape", [(5, 6, 7, 1), (4, 4, 4, 3), (9, 3, 8, 12)])
def test_grid_sample_3d_matches_torch(shape):
    rng = np.random.RandomState(0)
    grid = rng.randn(*shape).astype(np.float32)
    xyz_min = (-1.2, -0.5, -2.0)
    xyz_max = (1.0, 1.5, 0.7)
    # in-range + out-of-range + exactly-on-corner queries
    xyz = rng.uniform(-2.5, 2.5, size=(257, 3)).astype(np.float32)
    xyz[:8] = np.array(xyz_min, np.float32)
    xyz[8:16] = np.array(xyz_max, np.float32)

    ref = torch_dense_grid_query(grid, xyz, xyz_min, xyz_max)

    mn = jnp.asarray(xyz_min)
    mx = jnp.asarray(xyz_max)
    coords01 = (jnp.asarray(xyz) - mn) / (mx - mn)
    got = interp.grid_sample_3d(jnp.asarray(grid), coords01)

    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_gradient_matches_torch():
    rng = np.random.RandomState(1)
    grid = rng.randn(6, 5, 4, 2).astype(np.float32)
    xyz_min = (0.0, 0.0, 0.0)
    xyz_max = (1.0, 1.0, 1.0)
    xyz = rng.uniform(-0.2, 1.2, size=(64, 3)).astype(np.float32)
    cot = rng.randn(64, 2).astype(np.float32)

    # torch grad wrt grid
    g_t = torch.from_numpy(np.moveaxis(grid, -1, 0)[None]).requires_grad_(True)
    pts = torch.from_numpy(xyz).reshape(1, 1, 1, -1, 3)
    ind_norm = pts.flip((-1,)) * 2 - 1
    out = F.grid_sample(g_t, ind_norm, mode="bilinear", align_corners=True)
    out = out.reshape(2, -1).T
    out.backward(torch.from_numpy(cot))
    ref_grad = np.moveaxis(g_t.grad[0].numpy(), 0, -1)

    def f(g):
        return jnp.sum(interp.grid_sample_3d(g, jnp.asarray(xyz)) * jnp.asarray(cot))

    got_grad = jax.grad(f)(jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got_grad), ref_grad, rtol=1e-4, atol=1e-5)


def test_resize_grid_matches_torch_interpolate():
    rng = np.random.RandomState(2)
    grid = rng.randn(5, 7, 6, 3).astype(np.float32)
    new_size = (11, 4, 9)
    ref = (
        F.interpolate(
            torch.from_numpy(np.moveaxis(grid, -1, 0)[None]),
            size=new_size,
            mode="trilinear",
            align_corners=True,
        )[0]
        .numpy()
    )
    ref = np.moveaxis(ref, 0, -1)
    got = interp.resize_grid_3d(jnp.asarray(grid), new_size)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_max_pool_3d_same_matches_torch():
    rng = np.random.RandomState(3)
    vol = rng.randn(7, 6, 5).astype(np.float32)
    ref = F.max_pool3d(
        torch.from_numpy(vol)[None, None], kernel_size=3, padding=1, stride=1
    )[0, 0].numpy()
    got = interp.max_pool_3d_same(jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)


def test_grid_sample_2d_matches_torch():
    rng = np.random.RandomState(4)
    plane = rng.randn(6, 9, 4).astype(np.float32)  # [H,W,C]
    hw = rng.uniform(-0.3, 1.3, size=(100, 2)).astype(np.float32)

    g = torch.from_numpy(np.moveaxis(plane, -1, 0)[None])  # [1,C,H,W]
    # torch grid: coords (x indexes W, y indexes H) in [-1,1]
    coords = torch.from_numpy(
        np.stack([hw[:, 1] * 2 - 1, hw[:, 0] * 2 - 1], -1)
    ).reshape(1, 1, -1, 2)
    ref = (
        F.grid_sample(g, coords, mode="bilinear", align_corners=True)
        .reshape(4, -1)
        .T.numpy()
    )
    got = interp.grid_sample_2d(jnp.asarray(plane), jnp.asarray(hw))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
