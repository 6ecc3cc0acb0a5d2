"""Device mesh + sharding helpers (the NCCL-DDP replacement).

The reference's only distribution is Lightning DDP over NCCL
(``/root/reference/train_block_nerf.py:127-128``). Here parallelism is
jax.sharding-native (SURVEY.md §2.3):

  * ``data`` axis — the per-step ray batch is sharded across chips; grid
    parameters are replicated; XLA SPMD inserts the gradient psum over ICI
    and overlaps it with the backward pass.
  * ``grid`` axis — huge voxel grids are sharded on their leading spatial
    axis; trilinear reads at shard borders become XLA collective gathers.
  * block parallelism (Block-NeRF scenes) maps blocks onto mesh slices; see
    :mod:`unboundednerfpytorch_tpu.parallel.blocks`.

Multi-host: ``jax.distributed.initialize`` handles DCN rendezvous before the
mesh is built; nothing else changes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    grid_parallel: int = 1,
    devices=None,
) -> Mesh:
    """1D data mesh, or 2D (data, grid) when grid_parallel > 1."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if grid_parallel > 1:
        assert n % grid_parallel == 0, (n, grid_parallel)
        arr = np.asarray(devices).reshape(n // grid_parallel, grid_parallel)
        return Mesh(arr, ("data", "grid"))
    return Mesh(np.asarray(devices), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a voxel grid's leading spatial axis across the grid axis."""
    if "grid" in mesh.axis_names:
        return NamedSharding(mesh, P("grid"))
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items() if v is not None}


def shard_params(mesh: Mesh, params, shard_grids: bool = False):
    """Replicate params; optionally shard grid leaves spatially.

    Grid leaves are recognized by ndim >= 4 (``[X,Y,Z,C]`` or banked
    ``[B,X,Y,Z,C]``); the leading *spatial* axis is sharded.
    """
    rep = replicated(mesh)
    if not shard_grids or "grid" not in mesh.axis_names:
        return jax.device_put(params, rep)
    gsize = mesh.shape["grid"]

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 4 and leaf.shape[0] % gsize == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P("grid")))
        if hasattr(leaf, "ndim") and leaf.ndim == 5 and leaf.shape[1] % gsize == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P(None, "grid")))
        return jax.device_put(leaf, rep)

    return jax.tree.map(place, params)
