"""Ray samplers: 'flatten' epoch-permutation semantics (every ray exactly
once per epoch, device- and host-side) and the host-resident ray store
(`load2gpu_on_the_fly`) end-to-end."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.train import step as step_mod


def test_device_flatten_sampler_epoch_coverage():
    """The fused device sampler must visit every ray exactly once per epoch
    and reshuffle between epochs."""
    n_total, n_rand = 96, 16
    store = {"rgb": jnp.arange(n_total, dtype=jnp.float32)[:, None]}

    seen_batches = []

    def fake_step(state, batch, key):
        # return the sampled ids as 'metrics'
        return state, batch["rgb"][:, 0]

    fstep = step_mod.make_flatten_sampled_step(fake_step, n_rand, donate=False)
    samp = step_mod.init_sampler_state(n_total, jax.random.PRNGKey(0))
    state = jnp.zeros(())
    epoch1, epoch2 = [], []
    for i in range(n_total // n_rand * 2):
        state, samp, ids = fstep(state, samp, store, jax.random.PRNGKey(i))
        (epoch1 if i < n_total // n_rand else epoch2).append(np.asarray(ids))
    e1 = np.sort(np.concatenate(epoch1)).astype(int)
    e2 = np.sort(np.concatenate(epoch2)).astype(int)
    np.testing.assert_array_equal(e1, np.arange(n_total))
    np.testing.assert_array_equal(e2, np.arange(n_total))
    # different order between epochs
    assert not np.array_equal(np.concatenate(epoch1), np.concatenate(epoch2))


def test_host_flatten_sampler_epoch_coverage():
    n_total, n_rand = 80, 16
    store = {"rgb": np.arange(n_total)[:, None]}
    s = step_mod.HostRayStoreSampler(store, n_rand, seed=3, mode="flatten")
    ids = np.concatenate(
        [s.next_batch()["rgb"][:, 0] for _ in range(n_total // n_rand)]
    )
    np.testing.assert_array_equal(np.sort(ids), np.arange(n_total))
    assert not np.array_equal(ids, np.arange(n_total))  # actually shuffled


def test_host_random_sampler():
    store = {"rgb": np.arange(50)[:, None]}
    s = step_mod.HostRayStoreSampler(store, 8, seed=0, mode="random")
    b1 = s.next_batch()["rgb"]
    b2 = s.next_batch()["rgb"]
    assert b1.shape == (8, 1)
    assert not np.array_equal(b1, b2)


@pytest.mark.slow
def test_host_store_training_converges():
    """load2gpu_on_the_fly: the full run with a host-resident numpy ray
    store must train to the same quality as the device-store path."""
    from unboundednerfpytorch_tpu.configs.schema import (
        DataConfig, ExpConfig, ModelRenderConfig, TrainStageConfig,
    )
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.train import loop

    data = synthetic.make_data_dict(n_views=6, H=32, W=32)
    cfg = ExpConfig(
        data=DataConfig(load2gpu_on_the_fly=True),
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=150,
            N_rand=512,
            ray_sampler="flatten",
            pervoxel_lr=False,
            pg_scale=(),
            skip_zero_grad_fields=("density", "k0"),
            weight_entropy_last=0.001,
            weight_rgbper=0.01,
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_rgb=32**3,
            num_voxels_density=32**3,
            num_voxels_base_rgb=32**3,
            num_voxels_base_density=32**3,
            rgbnet_dim=9,
            alpha_init=1e-2,
            fast_color_thres=1e-4,
            maskout_near_cam_vox=False,
            world_bound_scale=1.05,
        ),
    )
    _, _, _, psnr = loop.run_train(cfg, data, log_fn=lambda s: None)
    assert psnr > 14.0, f"host-store training did not converge: psnr={psnr}"


def test_host_store_stays_numpy():
    """gather_training_rays(host=True) must return numpy leaves."""
    from unboundednerfpytorch_tpu.configs.schema import ExpConfig
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.train import loop

    data = synthetic.make_data_dict(n_views=3, H=16, W=16)
    store = loop.gather_training_rays(ExpConfig(), data, host=True)
    for k, v in store.items():
        assert isinstance(v, np.ndarray), f"{k} is {type(v)}"
    assert store["rgb"].shape[0] == 3 * 16 * 16


def test_multihost_view_sharding_partitions_exactly():
    from unboundednerfpytorch_tpu.train import step as step_mod

    i_train = np.arange(11)
    shards = [
        step_mod.shard_views_for_host(i_train, p, 4) for p in range(4)
    ]
    joined = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(joined, i_train)
    # deterministic + disjoint
    assert all(
        set(a.tolist()).isdisjoint(b.tolist())
        for i, a in enumerate(shards) for b in shards[i + 1:]
    )
    # identity single-process
    np.testing.assert_array_equal(
        step_mod.shard_views_for_host(i_train, 0, 1), i_train
    )
    assert step_mod.per_host_batch_size(4096, 4) == 1024
