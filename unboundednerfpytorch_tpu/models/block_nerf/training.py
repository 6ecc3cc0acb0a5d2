"""Block-NeRF training: the Lightning-DDP replacement.

Re-designs ``/root/reference/block_nerf/block_nerf_lightning.py`` +
``train_block_nerf.py``: one jitted train step (hierarchical render + the
four-term BlockNeRF loss + Adam), data-parallel over a jax.sharding Mesh —
XLA SPMD inserts the gradient psum over ICI, replacing NCCL DDP. Per-block
training remains embarrassingly parallel: one call per ``block_index``,
blocks mappable onto mesh slices or separate hosts.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unboundednerfpytorch_tpu.models.block_nerf import model as M
from unboundednerfpytorch_tpu.models.block_nerf import rendering as R
from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod


@struct.dataclass
class BlockTrainState:
    params: M.BlockNeRFParams
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 5e-4, decay_steps: int = 250_000,
                   decay_rate: float = 0.1):
    """Adam with exponential decay (the Lightning setup's optimizer)."""
    schedule = optax.exponential_decay(lr, decay_steps, decay_rate)
    return optax.adam(schedule)


def create_state(key: jax.Array, n_appearance: int, lr: float = 5e-4) -> BlockTrainState:
    params = M.create(key, n_appearance=n_appearance)
    tx = make_optimizer(lr)
    return BlockTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def make_train_step(
    lr: float = 5e-4,
    n_samples: int = 64,
    n_importance: int = 64,
    lambda_mu: float = 0.01,
    visi_loss: float = 1e-2,
    use_disp: bool = True,
    **render_kwargs,
):
    """use_disp defaults True like the reference CLI
    (train_block_nerf.py:53): log-linear depth sampling. Extra
    ``render_kwargs`` (xyz_freqs/dir_freqs/exposure_freqs) pass through to
    the renderer for non-default model sizes."""
    tx = make_optimizer(lr)

    def loss_fn(params, batch, key):
        results = R.render_rays(
            params, batch["rays"], batch["ts"], key=key,
            n_samples=n_samples, n_importance=n_importance,
            use_disp=use_disp, **render_kwargs,
        )
        losses = M.block_nerf_loss(
            results, batch["rgbs"], lambda_mu=lambda_mu, visi_loss=visi_loss
        )
        total = sum(losses.values())
        psnr = -10.0 * jnp.log10(losses["rgb_fine"])
        return total, {"loss": total, "psnr": psnr, **losses}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: BlockTrainState, batch: dict, key: jax.Array):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            BlockTrainState(
                params=new_params, opt_state=new_opt, step=state.step + 1
            ),
            metrics,
        )

    return step


def train_block(
    state: BlockTrainState,
    ray_store: dict,  # {"rays": [N,10], "rgbs": [N,3], "ts": [N]}
    n_steps: int,
    batch_size: int = 1024,
    key: jax.Array | None = None,
    mesh=None,
    log_every: int = 500,
    log_fn=print,
    use_disp: bool = True,
    n_samples: int = 64,
    n_importance: int = 64,
    **render_kwargs,
):
    """Train one block. With a mesh, the ray batch is sharded over the data
    axis; grads all-reduce over ICI automatically (the DDP replacement)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    step_fn = make_train_step(
        n_samples=n_samples, n_importance=n_importance, use_disp=use_disp,
        **render_kwargs,
    )

    @jax.jit
    def sample(store, k):
        idx = jax.random.randint(k, (batch_size,), 0, store["rgbs"].shape[0])
        return {kk: v[idx] for kk, v in store.items()}

    if mesh is not None:
        state = state.replace(params=mesh_mod.shard_params(mesh, state.params))

    for i in range(1, n_steps + 1):
        key, k1, k2 = jax.random.split(key, 3)
        batch = sample(ray_store, k1)
        if mesh is not None:
            batch = mesh_mod.shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch, k2)
        if i % log_every == 0 or i == n_steps:
            m = jax.device_get(metrics)
            log_fn(f"block step {i}: loss {float(m['loss']):.5f} psnr {float(m['psnr']):.2f}")
    return state, metrics
