"""Golden tests: masked Adam vs a straightforward numpy emulation of the
reference CUDA kernels (adam_upd_kernel.cu:8-58) and the param-group factory."""

import numpy as np

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.optim import factory, masked_adam
from unboundednerfpytorch_tpu.optim.masked_adam import AdamHyper


def np_adam_step(p, g, m, v, step, lr, b1=0.9, b2=0.99, eps=1e-8,
                 masked=False, per_lr=None):
    """Reference semantics: bias correction folded into step_size."""
    step_size = lr * np.sqrt(1 - b2**step) / (1 - b1**step)
    if masked:
        upd = g != 0
    else:
        upd = np.ones_like(g, dtype=bool)
    m2 = np.where(upd, b1 * m + (1 - b1) * g, m)
    v2 = np.where(upd, b2 * v + (1 - b2) * g * g, v)
    delta = step_size * m2 / (np.sqrt(v2) + eps)
    if per_lr is not None:
        delta = delta * per_lr
    p2 = np.where(upd, p - delta, p)
    return p2, m2, v2


def test_plain_and_masked_adam_match_reference():
    rng = np.random.RandomState(0)
    p0 = rng.randn(64).astype(np.float32)
    params = {"a": jnp.asarray(p0), "b": jnp.asarray(p0 * 2)}
    hyper = {
        "a": AdamHyper(lr=1e-2, skip_zero_grad=False),
        "b": AdamHyper(lr=5e-3, skip_zero_grad=True),
    }
    state = masked_adam.init(params)

    np_state = {
        k: (np.asarray(params[k]), np.zeros(64, np.float32), np.zeros(64, np.float32))
        for k in params
    }
    for step in range(1, 4):
        g_a = rng.randn(64).astype(np.float32)
        g_b = rng.randn(64).astype(np.float32)
        g_b[::3] = 0.0  # zero grads the masked update must skip
        grads = {"a": jnp.asarray(g_a), "b": jnp.asarray(g_b)}
        params, state = masked_adam.update(params, grads, state, hyper)

        pa, ma, va = np_state["a"]
        np_state["a"] = np_adam_step(pa, g_a, ma, va, step, 1e-2)
        pb, mb, vb = np_state["b"]
        np_state["b"] = np_adam_step(pb, g_b, mb, vb, step, 5e-3, masked=True)

    np.testing.assert_allclose(np.asarray(params["a"]), np_state["a"][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), np_state["b"][0], rtol=1e-5, atol=1e-6)


def test_pervoxel_lr():
    rng = np.random.RandomState(1)
    p0 = rng.randn(32).astype(np.float32)
    g = rng.randn(32).astype(np.float32)
    plr = rng.rand(32).astype(np.float32)
    params = {"d": jnp.asarray(p0)}
    hyper = {"d": AdamHyper(lr=1e-1, skip_zero_grad=True)}  # per-lr overrides skip
    state = masked_adam.init(params)
    new_params, _ = masked_adam.update(
        params, {"d": jnp.asarray(g)}, state, hyper, per_lr={"d": jnp.asarray(plr)}
    )
    ref, _, _ = np_adam_step(
        p0, g, np.zeros(32, np.float32), np.zeros(32, np.float32), 1, 1e-1, per_lr=plr
    )
    np.testing.assert_allclose(np.asarray(new_params["d"]), ref, rtol=1e-5, atol=1e-6)


def test_lr_decay_schedule():
    # 0.1^(step/decay_steps): after decay*1000 steps lr is exactly /10
    assert np.isclose(factory.lr_decay_scale(20_000, 20), 0.1)
    assert np.isclose(factory.lr_decay_scale(0, 20), 1.0)


def test_factory_split_respects_lrates():
    from unboundednerfpytorch_tpu.configs.schema import TrainStageConfig
    from unboundednerfpytorch_tpu.models import dvgo

    cfg = dvgo.DVGOConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
        num_voxels=16**3, num_voxels_base=16**3, rgbnet_dim=4,
    )
    params = dvgo.create(cfg, jax.random.PRNGKey(0))
    tc = TrainStageConfig(
        lrate_density=0.1, lrate_k0=0.1, lrate_rgbnet=1e-3,
        skip_zero_grad_fields=("density", "k0"),
    )
    trainable, hyper = factory.split_trainable(params, tc)
    assert set(trainable) == {"density", "k0", "rgbnet"}
    # act_shift / mask_cache are never trained
    leaves_h = jax.tree.leaves(
        hyper, is_leaf=lambda x: isinstance(x, AdamHyper)
    )
    assert all(isinstance(h, AdamHyper) for h in leaves_h)
    merged = factory.merge_trainable(params, trainable)
    assert merged is not None

    # lr=0 freezes the group
    tc2 = TrainStageConfig(lrate_density=0.1, lrate_k0=0.0, lrate_rgbnet=0.0)
    trainable2, _ = factory.split_trainable(params, tc2)
    assert set(trainable2) == {"density"}
