"""Halo-exchange trilinear sampling for spatially-sharded voxel grids.

The >HBM case (SURVEY.md §7.3): a 320^3 x (2K+1) x C Fourier grid does not
fit one chip, so grids shard their leading spatial axis over the `grid` mesh
axis (parallel/mesh.shard_params). A trilinear query at the boundary plane
of shard k needs the first x-plane of shard k+1; letting XLA lower
`jnp.take` over the sharded axis inserts generic collective gathers of
whole table sections. This module does it the TPU-native way:

  1. ONE ppermute halo exchange: every shard receives its right neighbor's
     first x-plane, extending the local block to [Xs+1, Y, Z, C] — after
     which every cell (base plane + right corner plane) is locally resident;
  2. each shard answers the queries whose base x-plane it owns (ownership is
     a static function of floor(x), so exactly one shard answers each
     query) with a purely local gather;
  3. one psum combines the per-shard partial answers.

Collective traffic per query batch: Y*Z*C halo (once per call) + N*C psum —
independent of the grid size, vs. the table-sized gathers XLA inserts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unboundednerfpytorch_tpu.ops import interp


def sharded_grid_sample(
    mesh: Mesh,
    grid: jnp.ndarray,
    xyz01: jnp.ndarray,
    axis: str = "grid",
) -> jnp.ndarray:
    """Trilinearly sample a grid sharded on its leading spatial axis.

    Args:
      mesh: mesh containing ``axis``.
      grid: [X, Y, Z, C] voxel grid, X divisible by the axis size, sharded
        (or shardable) as P(axis).
      xyz01: [..., 3] query coords in [0, 1] (align_corners, zeros padding —
        identical semantics to :func:`ops.interp.grid_sample_3d`).

    Returns [..., C], replicated.
    """
    X, Y, Z, C = grid.shape
    n_shards = mesh.shape[axis]
    assert X % n_shards == 0, (X, n_shards)
    xs = X // n_shards

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
    )
    def run(grid_local, q):
        # grid_local: [xs, Y, Z, C] — this shard's x-slab
        idx = jax.lax.axis_index(axis)

        # 1. halo: receive the right neighbor's FIRST plane (left rotation);
        # the last shard receives shard 0's plane but never uses it (its
        # boundary cell x = X-1 has no right corner in-range).
        first_plane = grid_local[:1]
        halo = jax.lax.ppermute(
            first_plane, axis,
            [(i, (i - 1) % n_shards) for i in range(n_shards)],
        )
        # the last shard's "right neighbor" wrapped to shard 0 — but global
        # plane X does not exist; zero it so the out-of-range corner
        # contributes nothing (grid_sample_3d's local validity check sees
        # the halo plane as in-range)
        halo = jnp.where(idx == n_shards - 1, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([grid_local, halo], axis=0)  # [xs+1, Y, Z, C]

        # 2. ownership by base x-plane: shard k owns bases [k*xs, (k+1)*xs)
        cx = q[..., 0] * (X - 1)
        base_x = jnp.clip(jnp.floor(cx).astype(jnp.int32), -1, X - 1)
        # out-of-range coords (cx < 0 or > X-1) follow the same ownership as
        # their clamped base so exactly one shard still answers them; the
        # corner-validity weights inside grid_sample_3d zero them out.
        owner = jnp.clip(base_x, 0, X - 1) // xs
        mine = owner == idx

        # 3. local query: shift x into the extended local frame. The local
        # grid spans global planes [idx*xs, idx*xs + xs]; grid_sample_3d on
        # the extended block expects coords in [0,1] over (xs+1) planes.
        cx_local = cx - idx * xs
        q_local = jnp.stack(
            [
                cx_local / xs,  # (xs+1)-plane block: denom = (xs+1)-1
                q[..., 1],
                q[..., 2],
            ],
            axis=-1,
        )
        vals = interp.grid_sample_3d(ext, q_local)
        vals = jnp.where(mine[..., None], vals, 0.0)
        return jax.lax.psum(vals, axis)

    return run(grid, xyz01)
