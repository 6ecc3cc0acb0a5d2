"""Block-NeRF model: IPE cone encoding, the 8-layer skip MLP with
appearance/exposure conditioning, and the visibility MLP.

Re-designs ``/root/reference/block_nerf/block_nerf_model.py`` as pytree
params + pure functions. The MLP stacks are plain matmul chains — MXU food —
and the whole per-block network state is a single flax.struct pytree so block
replicas map directly onto mesh slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from unboundednerfpytorch_tpu.fields.mlp import MLP


def pos_embedding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """(sin 2^k x, cos 2^k x) interleaved per frequency, matching the
    reference PosEmbedding ordering (block_nerf_model.py:58-75): for each
    freq, [sin(f x), cos(f x)] — NO identity term. dim -> dim*2*n_freqs."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    out = []
    for k in range(n_freqs):
        out.append(jnp.sin(freqs[k] * x))
        out.append(jnp.cos(freqs[k] * x))
    return jnp.concatenate(out, axis=-1)


def inter_pos_embedding(mu: jnp.ndarray, diag_cov: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Integrated positional encoding of a Gaussian (mu, diag_cov):
    [sin(2^k mu), cos(2^k mu)] * exp(-0.5 * 4^k * diag_cov)
    (block_nerf_model.py:25-55). dim -> dim*2*n_freqs."""
    out = []
    for k in range(n_freqs):
        f = 2.0**k
        damp = jnp.exp(-0.5 * (f * f) * diag_cov)
        out.append(jnp.sin(f * mu) * damp)
        out.append(jnp.cos(f * mu) * damp)
    return jnp.concatenate(out, axis=-1)


@struct.dataclass
class BlockNeRFParams:
    """One block's networks + appearance table."""

    xyz_layers: MLP  # 8 linear+relu layers handled manually for the skip
    xyz_final: MLP  # W -> W linear
    dir_layers: MLP  # (W + dir + exp + appearance) -> W/2 stack
    sigma_head: MLP  # W -> 1 (+softplus)
    rgb_head: MLP  # W/2 -> 3 (+sigmoid)
    vis_layers: MLP  # visibility MLP trunk
    vis_head: MLP  # -> 1 (+softplus)
    appearance: jnp.ndarray  # [n_images, appearance_dim] embedding table


def default_dims(
    xyz_freqs: int = 10,
    dir_freqs: int = 4,
    exposure_freqs: int = 4,
    appearance_dim: int = 32,
):
    return {
        "in_xyz": 3 * 2 * xyz_freqs,  # 60
        "in_dir": 3 * 2 * dir_freqs,  # 24
        "in_exp": 1 * 2 * exposure_freqs,  # 8
        "in_app": appearance_dim,
    }


def create(
    key: jax.Array,
    n_appearance: int = 1,
    D: int = 8,
    W: int = 256,
    skips: tuple = (4,),
    xyz_freqs: int = 10,
    dir_freqs: int = 4,
    exposure_freqs: int = 4,
    appearance_dim: int = 32,
    vis_width: int = 128,
) -> BlockNeRFParams:
    dims = default_dims(xyz_freqs, dir_freqs, exposure_freqs, appearance_dim)
    keys = jax.random.split(key, 8)

    # xyz trunk: build as individual layers (skip cat at layer indices)
    ws, bs = [], []
    k = keys[0]
    for i in range(D):
        k, sub = jax.random.split(k)
        d_in = dims["in_xyz"] if i == 0 else (W + dims["in_xyz"] if i in skips else W)
        layer = MLP.create(sub, d_in, W, W, 1, zero_final_bias=False)
        ws.append(layer.weights[0])
        bs.append(layer.biases[0])
    xyz_layers = MLP(weights=tuple(ws), biases=tuple(bs))

    xyz_final = MLP.create(keys[1], W, W, W, 1, zero_final_bias=False)
    dir_in = W + dims["in_dir"] + dims["in_exp"] + dims["in_app"]
    dir_layers = MLP.create(keys[2], dir_in, W // 2, W // 2, 3, zero_final_bias=False)
    sigma_head = MLP.create(keys[3], W, W, 1, 1, zero_final_bias=False)
    rgb_head = MLP.create(keys[4], W // 2, W // 2, 3, 1, zero_final_bias=False)
    vis_in = dims["in_xyz"] + dims["in_dir"]
    vis_layers = MLP.create(keys[5], vis_in, vis_width, vis_width, 4, zero_final_bias=False)
    vis_head = MLP.create(keys[6], vis_width, vis_width, 1, 1, zero_final_bias=False)
    appearance = jax.random.normal(keys[7], (n_appearance, appearance_dim)) * 0.01
    return BlockNeRFParams(
        xyz_layers=xyz_layers,
        xyz_final=xyz_final,
        dir_layers=dir_layers,
        sigma_head=sigma_head,
        rgb_head=rgb_head,
        vis_layers=vis_layers,
        vis_head=vis_head,
        appearance=appearance,
    )


def block_nerf_apply(
    params: BlockNeRFParams,
    xyz_enc: jnp.ndarray,
    dir_enc: jnp.ndarray | None = None,
    exp_enc: jnp.ndarray | None = None,
    app_enc: jnp.ndarray | None = None,
    sigma_only: bool = False,
    skips: tuple = (4,),
):
    """The Block_NeRF forward (block_nerf_model.py:126-158): skip-MLP trunk →
    sigma (softplus) and view/exposure/appearance-conditioned rgb (sigmoid)."""
    x = xyz_enc
    for i, (w, b) in enumerate(zip(params.xyz_layers.weights, params.xyz_layers.biases)):
        if i in skips:
            x = jnp.concatenate([x, xyz_enc], axis=-1)
        x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=jnp.float32) + b)
    sigma = jax.nn.softplus(params.sigma_head(x))[..., 0]
    if sigma_only:
        return sigma
    feat = params.xyz_final(x)
    h = jnp.concatenate(
        [feat, dir_enc]
        + ([exp_enc] if exp_enc is not None else [])
        + ([app_enc] if app_enc is not None else []),
        axis=-1,
    )
    h = params.dir_layers(h)
    h = jax.nn.relu(h)  # reference applies ReLU after every dir layer
    rgb = jax.nn.sigmoid(params.rgb_head(h))
    return rgb, sigma


def visibility_apply(params: BlockNeRFParams, xyz_enc, dir_enc):
    """Visibility MLP (block_nerf_model.py:161-175): transmittance
    distillation head, softplus output."""
    h = params.vis_layers(jnp.concatenate([xyz_enc, dir_enc], axis=-1))
    h = jax.nn.relu(h)
    return jax.nn.softplus(params.vis_head(h))[..., 0]


def block_nerf_loss(results: dict, target_rgb: jnp.ndarray,
                    lambda_mu: float = 0.01, visi_loss: float = 1e-2) -> dict:
    """BlockNeRFLoss (block_nerf_model.py:5-22): coarse+fine photometric MSE
    plus visibility distillation against detached transmittance."""
    out = {}
    out["rgb_coarse"] = lambda_mu * jnp.mean(
        (results["rgb_coarse"] - target_rgb) ** 2
    )
    out["rgb_fine"] = jnp.mean((results["rgb_fine"] - target_rgb) ** 2)
    out["transmittance_coarse"] = lambda_mu * visi_loss * jnp.mean(
        (jax.lax.stop_gradient(results["transmittance_coarse_real"])
         - results["transmittance_coarse_vis"]) ** 2
    )
    out["transmittance_fine"] = visi_loss * jnp.mean(
        (jax.lax.stop_gradient(results["transmittance_fine_real"])
         - results["transmittance_fine_vis"]) ** 2
    )
    return out
