"""Tiny view-dependent color MLP.

Replaces the reference ``rgbnet`` (``/root/reference/FourierGrid/dvgo.py:120-127``):
Linear(dim0, W) + ReLU, (depth-2) hidden Linear+ReLU, Linear(W, 3) with the
final bias zero-initialized. Weight init matches torch.nn.Linear defaults
(kaiming-uniform a=√5 ⇒ U(±1/√fan_in) for weights, U(±1/√fan_in) for biases)
so training trajectories line up with the reference.

Parameters are a list of (W, b) pairs; the forward is two stacked matmuls per
layer — pure MXU food. Weights are stored [in, out] so the forward is
``x @ W + b`` with no transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MLP:
    weights: tuple  # tuple of [in, out] arrays
    biases: tuple  # tuple of [out] arrays

    @classmethod
    def create(
        cls,
        key: jax.Array,
        dim_in: int,
        dim_hidden: int,
        dim_out: int,
        depth: int,
        zero_final_bias: bool = True,
        dtype=jnp.float32,
    ) -> "MLP":
        """depth counts total Linear layers (reference rgbnet_depth)."""
        dims = [dim_in] + [dim_hidden] * (depth - 1) + [dim_out]
        weights, biases = [], []
        for i in range(depth):
            key, kw, kb = jax.random.split(key, 3)
            fan_in = dims[i]
            bound = 1.0 / jnp.sqrt(fan_in)
            weights.append(
                jax.random.uniform(
                    kw, (dims[i], dims[i + 1]), minval=-bound, maxval=bound, dtype=dtype
                )
            )
            if zero_final_bias and i == depth - 1:
                biases.append(jnp.zeros((dims[i + 1],), dtype=dtype))
            else:
                biases.append(
                    jax.random.uniform(
                        kb, (dims[i + 1],), minval=-bound, maxval=bound, dtype=dtype
                    )
                )
        return cls(weights=tuple(weights), biases=tuple(biases))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            if i < n - 1:
                x = jax.nn.relu(x)
        return x
