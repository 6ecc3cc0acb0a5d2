"""The single jitted train step (L6 hot loop).

The reference drives its loop from Python with dozens of kernel launches per
iteration (``/root/reference/FourierGrid/run_train.py:185-296``). Here the
entire body — render forward, loss assembly, backward, TV gradient injection,
masked-Adam update, lr decay — is ONE jitted function; pg_scale boundaries
and fast_color_thres schedule changes are re-jit boundaries handled by the
driver (:mod:`unboundednerfpytorch_tpu.train.loop`).

The TV schedule gates (tv_every/tv_after/tv_before) and the dense/sparse TV
mode are evaluated on the traced step counter with `where`-selects, so no
retrace happens per step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from unboundednerfpytorch_tpu.configs.schema import TrainStageConfig
from unboundednerfpytorch_tpu.models.common import RenderResult
from unboundednerfpytorch_tpu.ops import losses as L
from unboundednerfpytorch_tpu.ops import tv as tv_ops
from unboundednerfpytorch_tpu.optim import factory, masked_adam


@struct.dataclass
class TrainState:
    params: Any  # full model params pytree
    opt_state: masked_adam.MaskedAdamState
    step: jnp.ndarray  # scalar int32 global step
    per_lr: Any = None  # optional {group: per-element lr pytree}


def create_train_state(params, train_cfg: TrainStageConfig, start_step: int = 0) -> TrainState:
    trainable, _ = factory.split_trainable(params, train_cfg)
    return TrainState(
        params=params,
        opt_state=factory.init_state(trainable),
        step=jnp.asarray(start_step, jnp.int32),
        per_lr=None,
    )


def _tensorf_tv_loss(sub, wx: float, wy: float, wz: float):
    """Smooth-L1 TV over the TensoRF planes/vectors (reference grid.py:146-160;
    loss-based there — its grad is injected like the dense-grid TV)."""

    def sl1(d):
        a = jnp.abs(d)
        return jnp.sum(jnp.where(a < 1.0, 0.5 * d * d, a - 0.5))

    loss = (
        wx * sl1(sub.xy_plane[1:] - sub.xy_plane[:-1])
        + wy * sl1(sub.xy_plane[:, 1:] - sub.xy_plane[:, :-1])
        + wx * sl1(sub.xz_plane[1:] - sub.xz_plane[:-1])
        + wz * sl1(sub.xz_plane[:, 1:] - sub.xz_plane[:, :-1])
        + wy * sl1(sub.yz_plane[1:] - sub.yz_plane[:-1])
        + wz * sl1(sub.yz_plane[:, 1:] - sub.yz_plane[:, :-1])
        + wx * sl1(sub.x_vec[1:] - sub.x_vec[:-1])
        + wy * sl1(sub.y_vec[1:] - sub.y_vec[:-1])
        + wz * sl1(sub.z_vec[1:] - sub.z_vec[:-1])
    )
    return loss / 6.0


def make_train_step(
    forward_fn: Callable[..., RenderResult],
    train_cfg: TrainStageConfig,
    *,
    world_size_max: float = 128.0,
    tv_axis_scale: tuple | None = None,
    near_thres: float = 0.0,
    tv_fused: Callable | None = None,
    lr_anchor: int = 1,
    lr_decay_enabled: bool = True,
):
    """Build the jitted step.

    Args:
      forward_fn: (params, rays_o, rays_d, viewdirs, key) -> RenderResult.
        Close over the static model config and render kwargs.
      train_cfg: stage training config (loss weights, lrs, tv schedule).
      world_size_max: max(model world_size) — the TV weight multiplier
        ``weight * world_size.max()/128`` (dvgo.py:279-285).
      near_thres: near-clip threshold in contracted units (0 disables).
      lr_anchor: the step at which the lr equals the base lr. The reference
        decays AFTER each update (run_train.py:292-296), so step 1 trains at
        the undecayed lr (anchor=1) — and it rebuilds the optimizer with
        ``global_step=0`` at every pg_scale boundary (run_train.py:199),
        resetting the decay: the driver passes the last boundary crossed.
      lr_decay_enabled: False skips lr decay entirely — the reference's
        FourierGrid-on-tankstemple quirk (run_train.py:292).
      tv_fused: optional fused TV-injection op
        f(param_grid, grad_grid, wx, wy, wz, gate, dense) -> new grad_grid
        (ops/pallas/tv.make_tv_fused on TPU: one HBM pass instead of the
        ~17-pass XLA shift expression — 81 ms -> 13 ms at 160^3 x 7 x 12).
        None keeps the pure-XLA expression (CPU, spatially-sharded grids).
    """

    def loss_fn(trainable, frozen_params, batch, key):
        params = factory.merge_trainable(frozen_params, trainable)
        res: RenderResult = forward_fn(
            params, batch["rays_o"], batch["rays_d"], batch["viewdirs"], key,
            batch.get("img_index"),
        )
        # two-stage cache renders compact raw_rgb to [N, color_budget, 3],
        # which silently mis-pairs with the full [N, S] weights in rgbper —
        # cache render paths are render-only, never trained through
        assert not getattr(res, "rgb_compacted", False), (
            "training through a two-stage RenderCache forward: raw_rgb is "
            "compacted and must not feed training losses"
        )
        target = batch["rgb"]
        n_rays = target.shape[0]

        # each enabled component also lands in metrics UNWEIGHTED (scalar
        # observability, VERDICT r4 #8 — the reference's TensorBoardLogger
        # scalar series, train_block_nerf.py:111-113); stop_gradient'd so
        # recording never perturbs the backward
        components = {}
        mse_loss = L.mse(res.rgb_marched, target)
        loss = train_cfg.weight_main * mse_loss
        if train_cfg.weight_freq > 0:
            term = L.fourier_mse(res.rgb_marched, target)
            loss = loss + train_cfg.weight_freq * term
            components["loss_freq"] = term
        if train_cfg.weight_entropy_last > 0:
            term = L.entropy_last(res.alphainv_last)
            loss = loss + train_cfg.weight_entropy_last * term
            components["loss_entropy"] = term
        if train_cfg.weight_nearclip > 0 and near_thres > 0:
            term = L.nearclip(
                res.raw_density, res.t, near_thres, mask=res.mask
            )
            loss = loss + train_cfg.weight_nearclip * term
            components["loss_nearclip"] = term
        if train_cfg.weight_distortion > 0:
            term = L.distortion(res.weights, res.s, res.n_max, mask=res.mask)
            loss = loss + train_cfg.weight_distortion * term
            components["loss_distortion"] = term
        if train_cfg.weight_rgbper > 0:
            term = L.rgbper(
                res.raw_rgb, target, res.weights, n_rays, mask=res.mask
            )
            loss = loss + train_cfg.weight_rgbper * term
            components["loss_rgbper"] = term
        psnr = L.mse2psnr(jax.lax.stop_gradient(mse_loss))
        metrics = {"loss": loss, "mse": mse_loss, "psnr": psnr}
        for k, v in components.items():
            metrics[k] = jax.lax.stop_gradient(v)
        if res.color_overflow_frac is not None:
            # two-stage training truncation observability (fraction of rays
            # with more thres-surviving samples than the survivor budget)
            metrics["overflow_frac"] = jax.lax.stop_gradient(
                res.color_overflow_frac
            )
        return loss, metrics

    def add_tv_grads(grads: dict, trainable: dict, step, n_rays):
        """TV gradient injection between backward and the optimizer step
        (run_train.py:281-287)."""
        gate = (
            (step < train_cfg.tv_before)
            & (step > train_cfg.tv_after)
            & (step % train_cfg.tv_every == 0)
        )
        dense = step < train_cfg.tv_dense_before
        sx, sy, sz = tv_axis_scale or (
            world_size_max / 128.0,
        ) * 3
        for name, weight in (
            ("density", train_cfg.weight_tv_density),
            ("k0", train_cfg.weight_tv_k0),
        ):
            if weight <= 0 or name not in grads:
                continue
            sub = trainable[name]
            base_w = weight / n_rays
            if hasattr(sub, "grid"):
                g = grads[name].grid
                if tv_fused is not None:
                    grads[name] = grads[name].replace(grid=tv_fused(
                        sub.grid, g, base_w * sx, base_w * sy, base_w * sz,
                        gate, dense,
                    ))
                    continue
                # NOTE: keep this a single fused elementwise expression — a
                # lax.map over banks normalizes the [B,X,Y,Z,C] operands to
                # the default (channel-minor) layout, a 128/C-fold physical
                # padding of every temp (measured 6.75GB for ONE temp at
                # 160^3 x 7 banks x 12ch -> compile-time OOM)
                tvg = tv_ops.total_variation_grad(
                    sub.grid, base_w * sx, base_w * sy, base_w * sz,
                    dense_mode=True,
                )
                keep = dense | (g != 0)
                tvg = jnp.where(keep, tvg, 0.0) * gate.astype(g.dtype)
                grads[name] = grads[name].replace(grid=g + tvg)
            elif hasattr(sub, "xy_plane"):
                # TensoRF: inject the smooth-L1 TV loss gradient
                tv_grads = jax.grad(_tensorf_tv_loss)(
                    sub, base_w * sx, base_w * sy, base_w * sz
                )
                scale = gate.astype(jnp.float32)
                grads[name] = jax.tree.map(
                    lambda g_, t: g_ + scale * t, grads[name], tv_grads
                )
        return grads

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        trainable, hyper = factory.split_trainable(state.params, train_cfg)
        frozen = state.params
        step = state.step + 1  # reference counts global_step from 1

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, key
        )
        n_rays = batch["rgb"].shape[0]
        grads = add_tv_grads(dict(grads), trainable, step, n_rays)

        if lr_decay_enabled:
            lr_scale = factory.lr_decay_scale(
                jnp.maximum(step - lr_anchor, 0).astype(jnp.float32),
                train_cfg.lrate_decay,
            )
        else:
            lr_scale = 1.0
        metrics["lr_scale"] = jnp.asarray(lr_scale, jnp.float32)
        new_trainable, new_opt = masked_adam.update(
            trainable, grads, state.opt_state, hyper,
            lr_scale=lr_scale, per_lr=state.per_lr,
        )
        new_params = factory.merge_trainable(state.params, new_trainable)
        return (
            state.replace(params=new_params, opt_state=new_opt, step=step),
            metrics,
        )

    return train_step


def _constrain_batch(batch: dict, mesh) -> dict:
    """DP sharding constraint on a device-sampled batch: the gathered rays
    are resharded onto the `data` axis so the forward/backward run sharded
    across chips (params replicated -> XLA inserts the gradient psum over
    ICI and overlaps it with backward). No-op without a mesh."""
    if mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    return {k: jax.lax.with_sharding_constraint(v, sh) for k, v in batch.items()}


def make_sampled_step(train_step, n_rand: int, donate: bool = True, mesh=None):
    """Fuse device-side batch sampling with the step: one XLA program per
    iteration. Gathers a random ray batch from the (device-resident) ray
    store — the 'random' sampler semantics of run_train.py:204-240 — then
    runs the step. The store is passed as an argument so it is never baked
    into the executable. With ``mesh``, the batch is sharded over the `data`
    axis (ray/batch DP — the NCCL-DDP replacement, SURVEY.md §2.3)."""

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def sampled_step(state: TrainState, store: dict, key: jax.Array):
        k_idx, k_step = jax.random.split(key)
        n_total = store["rgb"].shape[0]
        idx = jax.random.randint(k_idx, (n_rand,), 0, n_total)
        batch = {k: v[idx] for k, v in store.items() if v is not None}
        return train_step(state, _constrain_batch(batch, mesh), k_step)

    return sampled_step


@struct.dataclass
class SamplerState:
    """Device-side epoch-permutation sampler ('flatten' semantics of
    dvgo.py:660-667 / run_train.py:204-240): a shuffled index buffer walked
    sequentially, reshuffled when exhausted — every ray is visited exactly
    once per epoch."""

    perm: jnp.ndarray  # [N_total] int32 shuffled ray indices
    cursor: jnp.ndarray  # scalar int32 position in perm


def init_sampler_state(n_total: int, key: jax.Array) -> SamplerState:
    return SamplerState(
        perm=jax.random.permutation(key, n_total).astype(jnp.int32),
        cursor=jnp.zeros((), jnp.int32),
    )


def make_flatten_sampled_step(train_step, n_rand: int, donate: bool = True,
                              mesh=None):
    """'flatten' sampler fused with the step. Signature:
    (state, samp, store, key) -> (state, samp, metrics)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def sampled_step(
        state: TrainState, samp: SamplerState, store: dict, key: jax.Array
    ):
        n_total = store["rgb"].shape[0]
        k_perm, k_step = jax.random.split(key)

        def reshuffle(s):
            return SamplerState(
                perm=jax.random.permutation(k_perm, n_total).astype(jnp.int32),
                cursor=jnp.zeros((), jnp.int32),
            )

        samp = jax.lax.cond(
            samp.cursor + n_rand > n_total, reshuffle, lambda s: s, samp
        )
        idx = jax.lax.dynamic_slice(samp.perm, (samp.cursor,), (n_rand,))
        samp = samp.replace(cursor=samp.cursor + n_rand)
        batch = {k: v[idx] for k, v in store.items() if v is not None}
        new_state, metrics = train_step(state, _constrain_batch(batch, mesh), k_step)
        return new_state, samp, metrics

    return sampled_step


def shard_views_for_host(
    i_train, process_index: int | None = None, process_count: int | None = None
):
    """Deterministic per-host view partition for the multi-host input
    pipeline (SURVEY.md §7.3): host h loads and stores only views
    i_train[h::n], so the union over hosts is the full training set and no
    image is loaded twice. Each host then draws its N_rand/n sub-batch from
    its local store (the per-host sampling convention of data-parallel
    input pipelines); the global batch is their concatenation via the
    `data`-axis sharding. Identity on single-process runs."""
    import jax

    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n <= 1:
        return i_train
    import numpy as np

    return np.asarray(i_train)[p::n]


def per_host_batch_size(n_rand: int, process_count: int | None = None) -> int:
    """Per-host share of the global ray batch (must divide evenly so the
    global batch size matches the reference recipe exactly)."""
    import jax

    n = jax.process_count() if process_count is None else process_count
    assert n_rand % n == 0, (
        f"N_rand={n_rand} must be divisible by process_count={n}"
    )
    return n_rand // n


class HostRayStoreSampler:
    """Host-resident ray store with epoch-permutation batching — the
    ``load2gpu_on_the_fly`` mode (run_train.py:242-248): the full flattened
    ray store stays in host RAM (numpy) and only the per-step batch crosses
    to the device, so scene size is bounded by host memory, not HBM.

    mode='flatten': every ray visited exactly once per epoch, reshuffled
    between epochs (dvgo.py:660-667). mode='random': with-replacement
    randint batches (the reference's 'random' sampler)."""

    def __init__(self, store: dict, n_rand: int, seed: int = 0,
                 mode: str = "flatten"):
        import numpy as np

        assert mode in ("flatten", "random"), mode
        self._np = np
        self.store = {
            k: (np.asarray(v) if v is not None else None)
            for k, v in store.items()
        }
        self.n_total = int(self.store["rgb"].shape[0])
        self.n_rand = int(n_rand)
        self.mode = mode
        self._rng = np.random.default_rng(seed)
        self._perm = None
        self._cursor = 0

    def fast_forward(self, n_steps: int) -> None:
        """Advance the RNG stream past `n_steps` draws without materializing
        batches — on resume, the sampler then yields the same batches the
        uninterrupted run would at steps > n_steps."""
        for _ in range(int(n_steps)):
            if self.mode == "random":
                self._rng.integers(0, self.n_total, size=self.n_rand)
            else:
                if self._perm is None or self._cursor + self.n_rand > self.n_total:
                    self._perm = self._rng.permutation(self.n_total)
                    self._cursor = 0
                self._cursor += self.n_rand

    def next_batch(self) -> dict:
        if self.mode == "random":
            idx = self._rng.integers(0, self.n_total, size=self.n_rand)
        else:
            if self._perm is None or self._cursor + self.n_rand > self.n_total:
                self._perm = self._rng.permutation(self.n_total)
                self._cursor = 0
            idx = self._perm[self._cursor : self._cursor + self.n_rand]
            self._cursor += self.n_rand
        return {
            k: v[idx] for k, v in self.store.items() if v is not None
        }
