"""Pallas fused march kernel vs the XLA reference composition (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import alpha as alpha_ops
from unboundednerfpytorch_tpu.ops.pallas import march


def _data(seed=0, n=40, s=33):
    rng = np.random.RandomState(seed)
    density = (rng.randn(n, s) * 3).astype(np.float32)
    mask = rng.rand(n, s) > 0.3
    return jnp.asarray(density), jnp.asarray(mask)


def test_forward_matches_xla_reference():
    density, mask = _data()
    shift, interval = -1.5, 0.6
    w, ai, alpha = march.fused_alpha2weights(density, mask, shift, interval, True)
    alpha_ref = jnp.where(mask, alpha_ops.raw2alpha(density, shift, interval), 0.0)
    w_ref, ai_ref = alpha_ops.alpha2weights(alpha_ref)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ai), np.asarray(ai_ref), rtol=1e-4, atol=1e-6)


def test_forward_pads_nonaligned_rays():
    density, mask = _data(1, n=37, s=17)  # not a multiple of the ray tile
    w, ai, alpha = march.fused_alpha2weights(density, mask, -1.0, 0.5, True)
    assert w.shape == (37, 17) and ai.shape == (37,)


@pytest.mark.slow
def test_backward_matches_xla_autodiff():
    density, mask = _data(2, n=24, s=19)
    shift, interval = -1.0, 0.5
    cot_w = jnp.asarray(np.random.RandomState(3).randn(24, 19).astype(np.float32))
    cot_l = jnp.asarray(np.random.RandomState(4).randn(24).astype(np.float32))

    def f_pallas(d):
        w, ai, _ = march.fused_alpha2weights(d, mask, shift, interval, True)
        return jnp.sum(w * cot_w) + jnp.sum(ai * cot_l)

    def f_xla(d):
        alpha = jnp.where(mask, alpha_ops.raw2alpha(d, shift, interval), 0.0)
        w, ai = alpha_ops.alpha2weights(alpha)
        return jnp.sum(w * cot_w) + jnp.sum(ai * cot_l)

    g_p = jax.grad(f_pallas)(density)
    g_x = jax.grad(f_xla)(density)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-3, atol=2e-5)
