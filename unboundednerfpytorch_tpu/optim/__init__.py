"""Optimizer (L2): masked Adam + param-group factory."""

from unboundednerfpytorch_tpu.optim.masked_adam import (
    AdamHyper,
    MaskedAdamState,
    init,
    update,
)
from unboundednerfpytorch_tpu.optim.factory import (
    init_state,
    lr_decay_scale,
    merge_trainable,
    split_trainable,
)

__all__ = [
    "AdamHyper",
    "MaskedAdamState",
    "init",
    "update",
    "init_state",
    "lr_decay_scale",
    "merge_trainable",
    "split_trainable",
]
