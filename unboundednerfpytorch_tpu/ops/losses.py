"""Training losses.

Re-implements, natively and differentiably, the loss zoo assembled in the
reference train loop (``/root/reference/FourierGrid/run_train.py:254-279``):
photometric MSE, Fourier-spectrum MSE (``FourierGrid_model.py:114-130``),
background-entropy, per-point rgb loss, near-clip, and the ray distortion
loss — the last in the prefix-sum form of ``FourierGrid_model.py:684-708`` /
``torch_efficient_distloss.flatten_eff_distloss``, but over fixed-shape
``[N_rays, N_samples]`` tensors (autodiff provides the backward the reference
hand-writes).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def mse2psnr(x: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(x)


def fourier_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE between the real parts of the per-pixel FFT along the last axis.

    Matches ``FourierMSELoss.forward`` (FourierGrid_model.py:117-130): only the
    real component enters the loss.
    """
    pred_fft = jnp.fft.fft(pred, axis=-1)
    gt_fft = jnp.fft.fft(target, axis=-1)
    return jnp.mean((pred_fft.real - gt_fft.real) ** 2)


def entropy_last(alphainv_last: jnp.ndarray) -> jnp.ndarray:
    """Background-probability entropy (run_train.py:259-261)."""
    p = jnp.clip(alphainv_last, 1e-6, 1.0 - 1e-6)
    return -jnp.mean(p * jnp.log(p) + (1.0 - p) * jnp.log(1.0 - p))


def rgbper(
    raw_rgb: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray,
    n_rays: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-point color loss weighted by (detached) marching weights.

    raw_rgb [N,S,3], target [N,3], weights [N,S] (run_train.py:275-278).
    """
    import jax

    per = jnp.sum((raw_rgb - target[:, None, :]) ** 2, axis=-1)
    w = jax.lax.stop_gradient(weights)
    if mask is not None:
        per = per * mask.astype(per.dtype)
    return jnp.sum(per * w) / n_rays


def distortion(
    weights: jnp.ndarray,
    s: jnp.ndarray,
    n_max: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Efficient ray distortion loss, fixed shape.

    weights, s: [N_rays, N_samples] (s = normalized 1 - 1/(1+t) midpoints).
    loss = mean_rays[ sum_ij w_i w_j |s_i - s_j| + (1/3)(1/n_max) sum w_i^2 ]
    computed with the prefix-sum identity
    loss_bi_i = 2 w_i (s_i · Σ_{j<i} w_j − Σ_{j<i} w_j s_j)
    (FourierGrid_model.py:689-694). Autodiff supplies the backward.
    """
    if mask is not None:
        weights = weights * mask.astype(weights.dtype)
    interval = 1.0 / n_max
    w_prefix = jnp.cumsum(weights, axis=-1) - weights
    ws_prefix = jnp.cumsum(weights * s, axis=-1) - weights * s
    loss_bi = 2.0 * weights * (s * w_prefix - ws_prefix)
    loss_uni = (1.0 / 3.0) * interval * weights**2
    n_rays = weights.shape[0]
    return (jnp.sum(loss_bi) + jnp.sum(loss_uni)) / n_rays


def nearclip(
    raw_density: jnp.ndarray, t: jnp.ndarray, near_thres: float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Near-camera density penalty (run_train.py:262-268).

    The reference computes (density - density.detach()).sum() over samples
    with t < thres: the VALUE is always zero, but the GRADIENT w.r.t.
    density is the near mask itself — i.e. a constant-slope push-down on
    density at near-camera samples, scaled by weight_nearclip. Pinned
    against the torch expression in tests/test_ops_golden.py.

    ``mask``: sample-survival mask. The reference indexes the COMPACTED
    ``raw_density``/``t`` (post fast_color_thres compaction,
    run_train.py:264-266), so sub-threshold samples receive no push-down;
    in fixed-shape-masked form that is ``(t < thres) & mask``.
    """
    import jax

    near_mask = t < near_thres
    if mask is not None:
        near_mask = near_mask & mask
    near_mask = near_mask.astype(raw_density.dtype)
    return jnp.sum((raw_density - jax.lax.stop_gradient(raw_density)) * near_mask)
