"""Fused Pallas TV-injection kernel vs the XLA expression (interpret mode on
CPU; the same kernel compiles for TPU — measured 81 ms -> 13 ms at the
flagship [7,160,160,160,12] bf16 shape, tools/probe_tv_cost.py).

Semantics under test (train/step.py::add_tv_grads composed into one op):
    out = grad + gate * where(dense | grad != 0, tv_grad(param), 0)
with tv_grad the clamped 6-neighbor gradient of
``total_variation_cuda.total_variation_add_grad``
(/root/reference/FourierGrid/cuda/total_variation_kernel.cu:13-68).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import tv as tv_ops
from unboundednerfpytorch_tpu.ops.pallas import tv as ptv


def _ref(p, g, wx, wy, wz, gate, dense):
    tvg = tv_ops.total_variation_grad(p, wx, wy, wz, dense_mode=True)
    keep = dense | (g != 0)
    return g + jnp.where(keep, tvg, 0.0) * jnp.float32(gate).astype(g.dtype)


def _data(shape, seed=0, sparse_frac=0.4, dtype=np.float32):
    rng = np.random.RandomState(seed)
    p = rng.randn(*shape).astype(dtype)
    g = (rng.randn(*shape) * (rng.rand(*shape) > sparse_frac)).astype(dtype)
    return jnp.asarray(p), jnp.asarray(g)


@pytest.mark.parametrize("shape,block_x", [
    ((2, 9, 8, 6, 2), None),   # banked, odd dims
    ((5, 5, 5, 1), None),      # plain 4D DenseGrid, C=1
    ((1, 4, 16, 10, 3), 3),    # ragged x-blocks (4 % 3 != 0)
    ((3, 1, 6, 5, 2), None),   # degenerate X=1
])
@pytest.mark.parametrize("dense", [True, False])
def test_matches_xla_expression(shape, block_x, dense):
    p, g = _data(shape)
    wx, wy, wz = 0.31, 0.11, 0.07
    ref = _ref(p, g, wx, wy, wz, 1.0, dense)
    got = ptv.tv_add_grad(p, g, wx, wy, wz, 1.0, dense,
                          block_x=block_x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gate_off_is_identity():
    p, g = _data((2, 6, 5, 4, 2), seed=3)
    got = ptv.tv_add_grad(p, g, 0.5, 0.5, 0.5, 0.0, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(g))


def test_traced_gate_and_dense():
    """gate/dense arrive as traced scalars inside the jitted step."""
    p, g = _data((2, 6, 5, 4, 2), seed=4)

    @jax.jit
    def run(p, g, step):
        gate = (step < 10) & (step % 2 == 0)
        dense = step < 5
        return ptv.tv_add_grad(p, g, 0.3, 0.3, 0.3, gate, dense,
                               interpret=True)

    ref_on = _ref(p, g, 0.3, 0.3, 0.3, 1.0, True)
    np.testing.assert_allclose(np.asarray(run(p, g, 2)), np.asarray(ref_on),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(run(p, g, 3)), np.asarray(g))


def test_mesh_wrapped_runs_replicated():
    """make_tv_fused(mesh=...) replicates the kernel over a DP mesh via
    shard_map (the flagship loop's multi-chip wiring)."""
    from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh()
    fn = ptv.make_tv_fused(mesh=mesh, interpret=True)
    p, g = _data((2, 8, 6, 4, 2), seed=5)
    p = jax.device_put(p, mesh_mod.replicated(mesh))
    g = jax.device_put(g, mesh_mod.replicated(mesh))
    got = jax.jit(lambda p, g: fn(p, g, 0.3, 0.2, 0.1, 1.0, True))(p, g)
    ref = _ref(p, g, 0.3, 0.2, 0.1, 1.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_train_step_with_fused_tv_matches_default():
    """make_train_step(tv_fused=...) reproduces the default XLA TV path."""
    from unboundednerfpytorch_tpu.configs.schema import (
        ModelRenderConfig, TrainStageConfig,
    )
    from unboundednerfpytorch_tpu.models import fourier_grid as fg
    from unboundednerfpytorch_tpu.train.step import (
        create_train_state, make_train_step,
    )

    mr = ModelRenderConfig(
        num_voxels_density=16**3, num_voxels_rgb=16**3,
        num_voxels_base_density=16**3, num_voxels_base_rgb=16**3,
        rgbnet_dim=4, rgbnet_width=16, rgbnet_depth=2,
        alpha_init=1e-2, fast_color_thres=1e-4, fourier_freq_num=1,
        stepsize=1.0,
    )
    cfg = fg.config_from(mr, (-3, -3, -3), (3, 3, 3), 16**3, 16**3)
    params = fg.create(cfg, jax.random.PRNGKey(0))
    tcfg = TrainStageConfig(
        N_iters=3, N_rand=32,
        weight_tv_density=1e-4, weight_tv_k0=1e-5,
        tv_before=1 << 30, tv_dense_before=2,
        skip_zero_grad_fields=("density", "k0"),
    )

    def fwd(p, ro, rd, vd, key, img_index=None):
        return fg.forward(p, cfg, ro, rd, vd, bg=1.0)

    def run(tv_fused):
        step = make_train_step(
            fwd, tcfg, world_size_max=float(max(cfg.world_size)),
            tv_fused=tv_fused,
        )
        state = create_train_state(params, tcfg)
        n = tcfg.N_rand
        key = jax.random.PRNGKey(1)
        ro = jnp.ones((n, 3)) * 2.5
        rd = -jnp.ones((n, 3))
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        batch = {"rgb": jnp.full((n, 3), 0.4), "rays_o": ro, "rays_d": rd,
                 "viewdirs": vd}
        for s in range(3):  # crosses the tv_dense_before=2 boundary
            state, _ = jax.jit(step)(state, batch, jax.random.fold_in(key, s))
        return state.params

    fused = ptv.make_tv_fused(interpret=True)
    p_ref = run(None)
    p_got = run(fused)
    for name in ("density", "k0"):
        a = np.asarray(getattr(p_ref, name).grid, np.float32)
        b = np.asarray(getattr(p_got, name).grid, np.float32)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
