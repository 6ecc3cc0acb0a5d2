"""Packed-corner gather engine: exact parity (values AND gradients) with the
reference-semantics trilinear sampler ``ops.interp.grid_sample_3d``."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import interp, packed


def _rand_queries(key, n, lo=-0.3, hi=1.3):
    # includes out-of-range coords: zeros-padding semantics must match
    return jax.random.uniform(key, (n, 3), minval=lo, maxval=hi)


@pytest.mark.parametrize("dims,C", [((5, 6, 7), 1), ((8, 8, 8), 13), ((4, 9, 3), 4)])
def test_packed_matches_reference_sampler(dims, C):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    grid = jax.random.normal(k1, (*dims, C))
    q = _rand_queries(k2, 257)

    ref = interp.grid_sample_3d(grid, q)
    got = packed.grid_sample_3d_packed(grid, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_packed_exact_corners_and_edges():
    grid = jnp.arange(3 * 3 * 3, dtype=jnp.float32).reshape(3, 3, 3, 1)
    # exactly on voxel centers: query == stored value
    q = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5]])
    out = packed.grid_sample_3d_packed(grid, q)
    assert float(out[0, 0]) == 0.0
    assert float(out[1, 0]) == 26.0
    ref = interp.grid_sample_3d(grid, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_packed_gradients_match():
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    grid = jax.random.normal(k1, (6, 5, 4, 3))
    q = _rand_queries(k2, 97)
    cot = jax.random.normal(k3, (97, 3))

    def loss_ref(g, x):
        return jnp.sum(interp.grid_sample_3d(g, x) * cot)

    def loss_packed(g, x):
        return jnp.sum(packed.grid_sample_3d_packed(g, x) * cot)

    gr_g, gr_x = jax.grad(loss_ref, argnums=(0, 1))(grid, q)
    gp_g, gp_x = jax.grad(loss_packed, argnums=(0, 1))(grid, q)
    np.testing.assert_allclose(np.asarray(gp_g), np.asarray(gr_g), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gr_x), rtol=1e-4, atol=1e-4)


def test_pack_corners_layout():
    grid = jnp.arange(2 * 2 * 2, dtype=jnp.float32).reshape(2, 2, 2, 1)
    table = packed.pack_corners(grid)  # [(3*3*3), 8]
    assert table.shape == (27, 8)
    # base voxel (0,0,0) -> packed row (1,1,1) -> flat 1*9+1*3+1 = 13
    row = np.asarray(table[13])
    expect = [grid[dx, dy, dz, 0] for dx, dy, dz in packed.CORNERS]
    np.testing.assert_allclose(row, np.asarray(expect))
    # base (-1,-1,-1) -> row 0: only corner (1,1,1) inside = grid[0,0,0]
    row0 = np.asarray(table[0])
    assert row0[-1] == 0.0 and row0.sum() == 0.0  # grid[0,0,0] == 0
    row0b = np.asarray(packed.pack_corners(grid + 5.0)[0])
    assert row0b[-1] == 5.0 and row0b[:-1].sum() == 0.0


def test_packed_bf16_table():
    key = jax.random.PRNGKey(5)
    grid = jax.random.normal(key, (8, 8, 8, 13)).astype(jnp.bfloat16)
    q = _rand_queries(jax.random.PRNGKey(6), 64, lo=0.0, hi=1.0)
    ref = interp.grid_sample_3d(grid, q)
    got = packed.grid_sample_3d_packed(grid, q)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_pack_corners_folded_chunked_matches():
    import jax
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.ops import packed as packed_ops

    for shape in ((9, 7, 5, 1), (16, 6, 6, 1), (5, 33, 3, 1)):
        g = jax.random.normal(jax.random.PRNGKey(0), shape)
        a = packed_ops.pack_corners_folded(g, 16)
        b = packed_ops.pack_corners_folded_chunked(g, 16, plane_chunk=16)
        assert a.shape == b.shape, (shape, a.shape, b.shape)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
