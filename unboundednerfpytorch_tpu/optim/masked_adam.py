"""Masked Adam (L2): the reference's custom optimizer as a pure transformation.

Replaces ``adam_upd_cuda`` + ``MaskedAdam``
(``/root/reference/FourierGrid/cuda/adam_upd_kernel.cu`` and
``masked_adam.py:21-75``) with a pure functional update that runs inside the
single jitted train step. Three behaviors, exactly as in the reference:

  1. plain fused Adam (bias correction folded into the step size);
  2. ``skip_zero_grad`` masked update — voxels whose grad is exactly zero
     this step keep stale moments and are not touched;
  3. per-element learning rate (``set_pervoxel_lr``: count/count.max()),
     applied when a per-lr array is attached to a leaf.

Learning-rate decay (0.1^(step/decay_steps), run_train.py:292-296) is the
caller's job via ``lr_scale``; per-group base lrs come from the
``lrate_*`` config keys through :func:`unboundednerfpytorch_tpu.optim.factory`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamHyper(NamedTuple):
    """Static per-leaf hyperparameters (stored in a matching pytree)."""

    lr: float
    skip_zero_grad: bool = False


class _NoPerLR:
    """Zero-leaf pytree sentinel marking 'no per-element lr' positions, so a
    sparse per_lr tree can share the params' structure under jit."""

    def __repr__(self):  # pragma: no cover
        return "NO_PER_LR"


jax.tree_util.register_pytree_node(
    _NoPerLR, lambda x: ((), None), lambda aux, ch: NO_PER_LR
)
NO_PER_LR = _NoPerLR()


def make_per_lr(trainable, group_trees: dict):
    """Build a per_lr pytree matching ``trainable``: for groups named in
    ``group_trees`` use the given subtree (same structure as the group, array
    leaves = per-element lr, e.g. normalized view counts for the density
    grid); everywhere else NO_PER_LR."""
    out = {}
    for name, sub in trainable.items():
        if name in group_trees:
            out[name] = group_trees[name]
        else:
            out[name] = jax.tree.map(lambda _: NO_PER_LR, sub)
    return out


class MaskedAdamState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    exp_avg: Any  # pytree matching params
    exp_avg_sq: Any  # pytree matching params


def _moment_like(p):
    """Adam moments are at-least-f32 even for bf16 grids (bf16 exp_avg_sq
    underflows; the reference keeps f32 state throughout)."""
    dt = jnp.promote_types(p.dtype, jnp.float32)
    return jnp.zeros(p.shape, dt)


def init(params: Any) -> MaskedAdamState:
    return MaskedAdamState(
        step=jnp.zeros((), jnp.int32),
        exp_avg=jax.tree.map(_moment_like, params),
        exp_avg_sq=jax.tree.map(_moment_like, params),
    )


def update(
    params: Any,
    grads: Any,
    state: MaskedAdamState,
    hyper: Any,
    lr_scale: jnp.ndarray | float = 1.0,
    per_lr: Any = None,
    beta1: float = 0.9,
    beta2: float = 0.99,
    eps: float = 1e-8,
) -> tuple[Any, MaskedAdamState]:
    """One optimizer step.

    Args:
      params/grads: matching pytrees.
      state: MaskedAdamState.
      hyper: pytree of AdamHyper with the same *structure* as params, treated
        as leaves via is_leaf.
      lr_scale: global decay multiplier 0.1^(step/decay_steps).
      per_lr: optional pytree (same structure, leaves arrays-or-None) of
        per-element lr multipliers (the pervoxel-lr mode).

    Returns (new_params, new_state).
    """
    step = state.step + 1
    t = step.astype(jnp.float32)
    bias_corr = jnp.sqrt(1.0 - beta2**t) / (1.0 - beta1**t)

    param_leaves, treedef = jax.tree.flatten(params)
    hyper_leaves = treedef.flatten_up_to(hyper)
    grad_leaves = treedef.flatten_up_to(grads)
    m_leaves = treedef.flatten_up_to(state.exp_avg)
    v_leaves = treedef.flatten_up_to(state.exp_avg_sq)
    if per_lr is None:
        plr_leaves = [None] * len(param_leaves)
    else:
        plr_leaves = treedef.flatten_up_to(per_lr)

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, h, plr in zip(
        param_leaves, grad_leaves, m_leaves, v_leaves, hyper_leaves, plr_leaves
    ):
        if isinstance(plr, _NoPerLR):
            plr = None
        step_size = h.lr * lr_scale * bias_corr
        # update math in the MOMENT dtype (>= f32); the param is cast back to
        # its own dtype — without the cast a bf16 grid comes out f32, which
        # both drifts the model dtype and retraces the jitted step every
        # iteration (and the retraced all-f32 program OOMs at 160^3)
        g = g.astype(m.dtype)
        if h.skip_zero_grad and plr is None:
            mask = g != 0
            m1 = jnp.where(mask, beta1 * m + (1.0 - beta1) * g, m)
            v1 = jnp.where(mask, beta2 * v + (1.0 - beta2) * g * g, v)
            p1 = jnp.where(
                mask,
                (p.astype(m.dtype) - step_size * m1 / (jnp.sqrt(v1) + eps))
                .astype(p.dtype),
                p,
            )
        else:
            m1 = beta1 * m + (1.0 - beta1) * g
            v1 = beta2 * v + (1.0 - beta2) * g * g
            upd = step_size * m1 / (jnp.sqrt(v1) + eps)
            if plr is not None:
                upd = upd * plr
            p1 = (p.astype(m.dtype) - upd).astype(p.dtype)
        new_p.append(p1)
        new_m.append(m1)
        new_v.append(v1)

    return (
        jax.tree.unflatten(treedef, new_p),
        MaskedAdamState(
            step=step,
            exp_avg=jax.tree.unflatten(treedef, new_m),
            exp_avg_sq=jax.tree.unflatten(treedef, new_v),
        ),
    )
