"""Optimizer factory: param groups from ``lrate_*`` config keys.

Mirrors ``create_optimizer_or_freeze_model``
(``/root/reference/FourierGrid/utils.py:26-56``): every training-config key
``lrate_<name>`` whose value is > 0 and which names a field of the model's
param pytree becomes a param group with that lr and a
``skip_zero_grad`` flag from ``skip_zero_grad_fields``. lr == 0 freezes the
field (it simply isn't part of the trainable partition).

The trainable partition is a plain dict {field_name: subtree}; merge it back
with ``params.replace(**trainable)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from unboundednerfpytorch_tpu.optim import masked_adam
from unboundednerfpytorch_tpu.optim.masked_adam import AdamHyper


def split_trainable(params: Any, train_cfg) -> tuple[dict, dict]:
    """Return ({group: subtree}, {group: AdamHyper-template}) for every
    lrate_* key in train_cfg matching a non-None param field."""
    trainable: dict[str, Any] = {}
    hyper: dict[str, Any] = {}
    skip_fields = tuple(getattr(train_cfg, "skip_zero_grad_fields", ()) or ())
    for f in dataclasses.fields(train_cfg):
        if not f.name.startswith("lrate_") or f.name == "lrate_decay":
            continue
        name = f.name[len("lrate_") :]
        lr = getattr(train_cfg, f.name)
        if not hasattr(params, name):
            continue
        sub = getattr(params, name)
        if sub is None or lr <= 0:
            continue
        trainable[name] = sub
        h = AdamHyper(lr=float(lr), skip_zero_grad=name in skip_fields)
        hyper[name] = jax.tree.map(lambda _: h, sub)
    return trainable, hyper


def merge_trainable(params: Any, trainable: dict) -> Any:
    return params.replace(**trainable)


def init_state(trainable: dict) -> masked_adam.MaskedAdamState:
    return masked_adam.init(trainable)


def lr_decay_scale(global_step, lrate_decay: int):
    """0.1^(step/(lrate_decay*1000)) — the reference's per-step exponential
    decay (run_train.py:292-296) expressed as an absolute schedule."""
    decay_steps = lrate_decay * 1000
    return 0.1 ** (global_step / decay_steps)
