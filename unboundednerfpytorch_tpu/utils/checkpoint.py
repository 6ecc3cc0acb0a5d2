"""Checkpoint manager.

Replaces ``FourierGridCheckpointManager``
(``/root/reference/FourierGrid/FourierGrid_ckpt_manager.py:11-97``) and the
plain torch.save path (``run_train.py:313-332``): a checkpoint stores
{global_step, model family, model config (the get_kwargs equivalent), params,
optimizer state} so the model can be re-instantiated from the file alone.

Format: a directory with ``meta.json`` (family/config/step) + flax msgpack
blobs — plain files, no torch pickle. Multi-block scenes keep per-block
checkpoints ``fine_last_{i}`` and can be min-merged device-side
(:func:`merge_blocks`, reference ``merge_blocks:60-97``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from unboundednerfpytorch_tpu.optim.masked_adam import MaskedAdamState

_FAMILY_MODULES = {
    "dvgo": "unboundednerfpytorch_tpu.models.dvgo",
    "dcvgo": "unboundednerfpytorch_tpu.models.dcvgo",
    "dmpigo": "unboundednerfpytorch_tpu.models.dmpigo",
    "FourierGrid": "unboundednerfpytorch_tpu.models.fourier_grid",
}

_FAMILY_CONFIG_CLS = {
    "dvgo": "DVGOConfig",
    "dcvgo": "DCVGOConfig",
    "dmpigo": "DMPIGOConfig",
    "FourierGrid": "FourierGridConfig",
}


def _import_family(family: str):
    import importlib

    return importlib.import_module(_FAMILY_MODULES[family])


def _cfg_to_jsonable(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    return d


def _cfg_from_jsonable(family: str, d: dict):
    mod = _import_family(family)
    cls = getattr(mod, _FAMILY_CONFIG_CLS[family])
    names = {f.name for f in dataclasses.fields(cls)}

    def fix(v):
        return tuple(v) if isinstance(v, list) else v

    return cls(**{k: fix(v) for k, v in d.items() if k in names})


def save_model(
    path: str,
    family: str,
    cfg,
    params,
    global_step: int = 0,
    opt_state: MaskedAdamState | None = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    meta = {
        "global_step": int(global_step),
        "family": family,
        "model_kwargs": _cfg_to_jsonable(cfg),
        "has_opt_state": opt_state is not None,
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    host_params = jax.tree.map(np.asarray, params)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host_params))
    if opt_state is not None:
        host_opt = jax.tree.map(np.asarray, opt_state)
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(host_opt))


def load_model(path: str, key=None):
    """Re-instantiate from the checkpoint alone (utils.py:70-74 semantics).

    Returns (family, cfg, params, global_step, opt_state_or_None).

    A reference torch ``.tar`` checkpoint is accepted transparently (converted
    in memory via :mod:`utils.reference_import`), so ``--ft_path
    fine_last.tar`` migrates a reference run without an explicit conversion
    step; optimizer state is not carried over in that case.
    """
    if os.path.isfile(path) and path.endswith(".tar"):
        from unboundednerfpytorch_tpu.utils.reference_import import (
            import_checkpoint,
        )

        family, cfg, params, step = import_checkpoint(path)
        return family, cfg, params, step, None
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    family = meta["family"]
    cfg = _cfg_from_jsonable(family, meta["model_kwargs"])
    mod = _import_family(family)
    template = mod.create(cfg, key if key is not None else jax.random.PRNGKey(0))
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(template, f.read())
    # from_bytes yields numpy leaves; promote to device arrays so restored
    # models are jit-traceable (numpy arrays can't be indexed by tracers)
    params = jax.tree.map(jnp.asarray, params)
    opt_state = None
    opt_path = os.path.join(path, "opt_state.msgpack")
    if meta.get("has_opt_state") and os.path.exists(opt_path):
        # structure recovered lazily by the caller (needs the trainable split)
        with open(opt_path, "rb") as f:
            opt_state = f.read()
    return family, cfg, params, meta["global_step"], opt_state


def restore_opt_state(opt_bytes: bytes, template: MaskedAdamState) -> MaskedAdamState:
    return serialization.from_bytes(template, opt_bytes)


def merge_blocks(block_paths: list[str], out_path: str) -> None:
    """Merge per-block checkpoints by elementwise min of their grids
    (FourierGrid_ckpt_manager.py:79-87: torch.min of density/k0/rgb grids),
    keeping the first block's other parameters."""
    assert block_paths, "no blocks to merge"
    family, cfg, params, step, _ = load_model(block_paths[0])
    merged = params
    for p in block_paths[1:]:
        fam_i, _, params_i, _, _ = load_model(p)
        assert fam_i == family
        merged = merged.replace(
            density=merged.density.replace(
                grid=jnp.minimum(merged.density.grid, params_i.density.grid)
            ),
            k0=merged.k0.replace(
                grid=jnp.minimum(merged.k0.grid, params_i.k0.grid)
            ),
        )
    # occupancy refresh after the merge (reference merge_blocks end)
    mod = _import_family(family)
    if hasattr(mod, "update_occupancy_cache"):
        merged = mod.update_occupancy_cache(merged, cfg)
    save_model(out_path, family, cfg, merged, global_step=step)
