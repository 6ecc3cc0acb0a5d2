"""Halo-exchange sharded trilinear sampling (parallel/halo.py): must match
the replicated ops.interp.grid_sample_3d exactly, including shard-boundary
cells and out-of-range coordinates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unboundednerfpytorch_tpu.ops import interp
from unboundednerfpytorch_tpu.parallel import halo, mesh as mesh_mod


@pytest.mark.slow
def test_sharded_sample_matches_replicated():
    mesh = mesh_mod.make_mesh(8, grid_parallel=8)
    # make_mesh(grid_parallel=8) needs n % 8 == 0 -> ('data', 'grid') mesh
    X, Y, Z, C = 32, 12, 10, 5
    grid = jax.random.normal(jax.random.PRNGKey(0), (X, Y, Z, C))

    key = jax.random.PRNGKey(1)
    q_in = jax.random.uniform(key, (2048, 3), minval=-0.1, maxval=1.1)
    # force exact shard-boundary bases and edge cases
    edges = jnp.array([
        [0.0, 0.5, 0.5],
        [1.0, 0.5, 0.5],                      # cx == X-1 exactly
        [(8 - 1e-6) / (X - 1), 0.5, 0.5],     # just left of shard boundary
        [8.0 / (X - 1), 0.5, 0.5],            # exactly on shard boundary
        [8.5 / (X - 1), 0.5, 0.5],            # straddles shards 2|3? (base 8)
        [-0.05, 0.2, 0.9],                    # out of range low
        [1.05, 0.2, 0.9],                     # out of range high
    ])
    q = jnp.concatenate([q_in, edges])

    ref = interp.grid_sample_3d(grid, q)
    grid_sh = jax.device_put(grid, NamedSharding(mesh, P("grid")))
    got = halo.sharded_grid_sample(mesh, grid_sh, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_sharded_field_training_matches_replicated():
    """The >HBM end-to-end path (VERDICT r2 item 5): the SHIPPED training
    loop with grid_parallel=2 (grids + Adam moments spatially sharded,
    queries through the halo sampler) must reproduce the replicated
    single-device trajectory."""
    import dataclasses as dc

    from unboundednerfpytorch_tpu.configs.schema import (
        DataConfig, ExpConfig, ModelRenderConfig, TrainStageConfig,
    )
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.train import loop as loop_mod

    data = synthetic.make_data_dict(n_views=3, H=16, W=16)
    # 17^3 voxels -> world_size (16,16,16): even dims so the grid axis (2)
    # divides and the leaves actually shard
    mr = ModelRenderConfig(
        num_voxels_density=17**3, num_voxels_rgb=17**3,
        num_voxels_base_density=17**3, num_voxels_base_rgb=17**3,
        rgbnet_dim=6, rgbnet_width=32, rgbnet_depth=2,
        alpha_init=1e-2, fast_color_thres=1e-4, fourier_freq_num=2,
        stepsize=1.0, maskout_near_cam_vox=False,
    )
    tr = TrainStageConfig(
        N_iters=3, N_rand=64, pg_scale=(), pervoxel_lr=False,
        weight_entropy_last=0.001, weight_rgbper=0.01,
        skip_zero_grad_fields=("density", "k0"),
    )
    cfg = ExpConfig(
        expname="halo_loop", model="FourierGrid",
        data=DataConfig(dataset_type="synthetic", white_bkgd=True),
        fine_model_and_render=mr, fine_train=tr,
    )
    bounds = ((-3.0,) * 3, (3.0,) * 3)

    logs = []
    out_sh = loop_mod.scene_rep_reconstruction(
        cfg, mr, tr, *bounds, data, stage="fine", seed=5,
        log_fn=lambda m: logs.append(str(m)), grid_parallel=2,
    )
    assert any("grids sharded spatially" in m for m in logs), logs
    # the grids were actually sharded over the grid axis
    shard_shape = out_sh[2].density.grid.sharding.shard_shape(
        out_sh[2].density.grid.shape
    )
    assert shard_shape[1] == out_sh[2].density.grid.shape[1] // 2

    out_1d = loop_mod.scene_rep_reconstruction(
        cfg, mr, tr, *bounds, data, stage="fine", seed=5,
        log_fn=lambda *a: None, use_mesh=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_sh[2].density.grid), np.asarray(out_1d[2].density.grid),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_sh[2].k0.grid), np.asarray(out_1d[2].k0.grid),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_sharded_sample_grad_matches():
    """The halo path is plain jnp inside shard_map — gradients must flow and
    match the replicated path (scatter-adds cross the halo correctly)."""
    mesh = mesh_mod.make_mesh(8, grid_parallel=8)
    X, Y, Z, C = 16, 6, 6, 2
    grid = jax.random.normal(jax.random.PRNGKey(0), (X, Y, Z, C))
    q = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))

    def loss_rep(g):
        return jnp.sum(interp.grid_sample_3d(g, q) ** 2)

    def loss_sh(g):
        return jnp.sum(halo.sharded_grid_sample(mesh, g, q) ** 2)

    g_rep = jax.grad(loss_rep)(grid)
    g_sh = jax.grad(loss_sh)(jax.device_put(grid, NamedSharding(mesh, P("grid"))))
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_rep), atol=1e-4,
                               rtol=1e-4)
