"""Golden tests for raw2alpha and the transmittance scan vs a straightforward
sequential emulation of the CUDA kernels (render_utils_kernel.cu:430-707)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import alpha as alpha_ops


def ref_raw2alpha(density, shift, interval):
    e = np.exp(density + shift)
    return 1.0 - np.power(1.0 + e, -interval)


def ref_alpha2weight(alpha_rows, thres=1e-3):
    """Sequential per-ray scan with the CUDA loop order (emit, update, break)."""
    weights = np.zeros_like(alpha_rows)
    alphainv = np.ones(alpha_rows.shape[0], dtype=alpha_rows.dtype)
    for r in range(alpha_rows.shape[0]):
        T = 1.0
        for i in range(alpha_rows.shape[1]):
            weights[r, i] = T * alpha_rows[r, i]
            T *= 1.0 - alpha_rows[r, i]
            if T < thres:
                break
        alphainv[r] = T
    return weights, alphainv


def test_raw2alpha_matches_reference_math():
    rng = np.random.RandomState(0)
    density = rng.randn(512).astype(np.float32) * 4
    shift = -2.3
    interval = 0.7
    ref = ref_raw2alpha(density.astype(np.float64), shift, interval)
    got = alpha_ops.raw2alpha(jnp.asarray(density), shift, interval)
    # float32 evaluation vs float64 reference: absolute 1e-4 is the f32 floor.
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_raw2alpha_grad_matches_analytic():
    rng = np.random.RandomState(1)
    density = rng.randn(64).astype(np.float32)
    shift, interval = -1.0, 0.5
    cot = rng.randn(64).astype(np.float32)

    got = jax.grad(
        lambda d: jnp.sum(alpha_ops.raw2alpha(d, shift, interval) * cot)
    )(jnp.asarray(density))
    # analytic from the CUDA backward: interval * (1+e)^(-interval-1) * e * g
    e = np.exp(density + shift)
    ref = interval * np.power(1 + e, -interval - 1) * e * cot
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("seed,shape", [(0, (16, 32)), (1, (7, 5)), (2, (4, 200))])
def test_alpha2weights_matches_sequential_scan(seed, shape):
    rng = np.random.RandomState(seed)
    # Mix of small and large alphas so some rays early-exit and some don't.
    a = rng.uniform(0, 1, size=shape).astype(np.float32) ** 3
    a[::3] *= 0.01  # some nearly-transparent rays
    ref_w, ref_last = ref_alpha2weight(a)
    got_w, got_last = alpha_ops.alpha2weights(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(got_w), ref_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_last), ref_last, rtol=1e-5, atol=1e-6)


def test_alpha2weights_mask_is_empty_space():
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 0.5, size=(8, 16)).astype(np.float32)
    mask = rng.rand(8, 16) > 0.4
    a_masked = np.where(mask, a, 0.0).astype(np.float32)
    ref_w, ref_last = ref_alpha2weight(a_masked)
    got_w, got_last = alpha_ops.alpha2weights(jnp.asarray(a), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_w), ref_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_last), ref_last, rtol=1e-5, atol=1e-6)


def test_alpha2weights_gradient_matches_reference_backward():
    """The CUDA backward: grad_i = gw_i*T_i - back_cum/(1-a_i), back_cum
    accumulating gw_j*w_j for j>i plus grad_last*alphainv_last — compare
    autodiff against that recurrence on rays with no early exit."""
    rng = np.random.RandomState(4)
    a = (rng.uniform(0, 1, size=(5, 10)) * 0.3).astype(np.float32)
    gw = rng.randn(5, 10).astype(np.float32)
    gl = rng.randn(5).astype(np.float32)

    def f(alpha):
        w, last = alpha_ops.alpha2weights(alpha, early_exit_thres=0.0)
        return jnp.sum(w * gw) + jnp.sum(last * gl)

    got = jax.grad(f)(jnp.asarray(a))

    # reference recurrence
    ref = np.zeros_like(a)
    for r in range(a.shape[0]):
        T = np.ones(a.shape[1] + 1, dtype=np.float64)
        for i in range(a.shape[1]):
            T[i + 1] = T[i] * (1 - a[r, i])
        w = T[:-1] * a[r]
        back_cum = gl[r] * T[-1]
        for i in range(a.shape[1] - 1, -1, -1):
            ref[r, i] = gw[r, i] * T[i] - back_cum / (1 - a[r, i] + 1e-10)
            back_cum += gw[r, i] * w[i]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_alpha2weights_flat_matches_fixed_shape():
    rng = np.random.RandomState(5)
    a = (rng.uniform(0, 1, size=(6, 12)) ** 2).astype(np.float32)
    w2d, last2d = alpha_ops.alpha2weights(jnp.asarray(a))
    flat = jnp.asarray(a.reshape(-1))
    ray_id = jnp.repeat(jnp.arange(6), 12)
    wf, lastf = alpha_ops.alpha2weights_flat(flat, ray_id, 6)
    np.testing.assert_allclose(
        np.asarray(wf).reshape(6, 12), np.asarray(w2d), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(lastf), np.asarray(last2d), rtol=1e-4, atol=1e-5)
