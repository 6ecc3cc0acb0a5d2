"""Packed-corner trilinear gather — the TPU gather engine.

The reference's hot loop is dominated by trilinear grid lookups
(``/root/reference/FourierGrid/grid.py:50-61`` via ``F.grid_sample`` and the
nearest-voxel CUDA lookup ``render_utils_kernel.cu:363-424``). On TPU, XLA
row-gathers are **issue-rate bound**: ~40-90M rows/s regardless of row width
up to the 128-lane tile (measured on v5e, see tools/probe_gather.py), so the
8-corner gather of a C-channel grid wastes 8x the issue slots that one
(8*C)-channel row would need (8*C <= 128 for C <= 16).

The engine therefore pre-packs the grid so that ONE gathered row holds all
eight corner vectors of a query's containing cell:

    P[b, :] = concat_{(dx,dy,dz) in {0,1}^3} padded_grid[b + (dx,dy,dz)]

with base indices b ranging over [-1, dim-1] (stored shifted by +1, with a
zero border so out-of-range corners read zeros — the ``padding_mode='zeros'``
semantics of the reference). A trilinear query then costs a single row
gather plus an 8-way weighted reduce on the VPU, and its *backward* is a
single wide-row scatter-add (4-5x the rows/s of narrow scatters on v5e)
followed by a static 8-slice reduction back to the unpacked layout — all
differentiable jnp, no custom VJP needed.

Cost: 8x grid memory for the packed table (built once per render, or once
per training step amortized over the ray batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# corner enumeration order — must match ops.interp.trilerp_corners
CORNERS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


def pack_corners(grid: jnp.ndarray) -> jnp.ndarray:
    """Pack a [X, Y, Z, C] grid into the [(X+1)*(Y+1)*(Z+1), 8*C] corner table.

    Row i*(Y+1)*(Z+1) + j*(Z+1) + k corresponds to base voxel
    (i-1, j-1, k-1) and holds the 8 corner vectors
    grid[i-1+dx, j-1+dy, k-1+dz] (zeros outside the grid) concatenated in
    :data:`CORNERS` order. Differentiable (pad + static slices).
    """
    X, Y, Z, C = grid.shape
    padded = jnp.pad(grid, ((1, 1), (1, 1), (1, 1), (0, 0)))
    parts = [
        padded[dx : dx + X + 1, dy : dy + Y + 1, dz : dz + Z + 1]
        for dx, dy, dz in CORNERS
    ]
    return jnp.concatenate(parts, axis=-1).reshape((X + 1) * (Y + 1) * (Z + 1), 8 * C)


def packed_table_bytes(dims: tuple, channels: int, itemsize: int = 2) -> int:
    """PHYSICAL size of the packed table for a (X, Y, Z) grid of ``channels``
    channels: TPU arrays pad the trailing dim to the 128-lane tile, so a
    row of 8*channels lanes occupies ceil(8*channels/128)*128 lanes of HBM."""
    X, Y, Z = dims
    lanes = -(-(8 * channels) // 128) * 128
    return (X + 1) * (Y + 1) * (Z + 1) * lanes * itemsize


def corner_base_and_weights(xyz01: jnp.ndarray, dims: tuple):
    """Base row index into the packed table + per-corner trilinear weights.

    Same weight semantics as ``ops.interp.trilerp_corners`` (align_corners
    mapping, out-of-bounds corners zero-weighted); returns
    (base_idx [...], w [..., 8]).
    """
    X, Y, Z = dims
    c = xyz01 * (jnp.asarray([X, Y, Z], xyz01.dtype) - 1)
    c0 = jnp.floor(c)
    f = c - c0
    c0i = c0.astype(jnp.int32)

    # validity of each corner (true, unclamped indices)
    v0 = (c0i >= 0) & (c0i < jnp.asarray([X, Y, Z], jnp.int32))
    v1 = (c0i + 1 >= 0) & (c0i + 1 < jnp.asarray([X, Y, Z], jnp.int32))

    w_list = []
    for dx, dy, dz in CORNERS:
        wx = f[..., 0] if dx else 1.0 - f[..., 0]
        wy = f[..., 1] if dy else 1.0 - f[..., 1]
        wz = f[..., 2] if dz else 1.0 - f[..., 2]
        vx = v1[..., 0] if dx else v0[..., 0]
        vy = v1[..., 1] if dy else v0[..., 1]
        vz = v1[..., 2] if dz else v0[..., 2]
        w_list.append(wx * wy * wz * (vx & vy & vz).astype(xyz01.dtype))
    w = jnp.stack(w_list, -1)

    # base voxel clamped to the packed range [-1, dim-1], stored shifted +1
    bi = jnp.clip(c0i[..., 0], -1, X - 1) + 1
    bj = jnp.clip(c0i[..., 1], -1, Y - 1) + 1
    bk = jnp.clip(c0i[..., 2], -1, Z - 1) + 1
    base = (bi * (Y + 1) + bj) * (Z + 1) + bk
    return base, w


def packed_trilerp(
    table: jnp.ndarray,
    base_idx: jnp.ndarray,
    w: jnp.ndarray,
    channels: int,
) -> jnp.ndarray:
    """One-row-per-query trilinear interpolation from a packed table.

    table [(X+1)(Y+1)(Z+1), 8*C], base_idx [...], w [..., 8] -> [..., C].
    """
    rows = jnp.take(table, base_idx, axis=0, mode="clip")
    rows = rows.reshape(*base_idx.shape, 8, channels)
    out_dtype = jnp.promote_types(table.dtype, jnp.float32)
    return jnp.einsum(
        "...kc,...k->...c",
        rows.astype(out_dtype),
        w.astype(out_dtype),
    )


def pack_corners_folded(grid: jnp.ndarray, fold: int) -> jnp.ndarray:
    """Corner table with ``fold`` consecutive bases per row:
    [ceil(T/fold), fold*8*C].

    TPU arrays pad their trailing dim to the 128-lane tile, so a [T, 8*C]
    table with 8*C << 128 wastes HBM 128/(8*C)-fold (measured: the 8-lane
    density table physically occupied 7.5GB instead of 0.47GB). Folding
    fold = 128//(8*C) bases into one 128-lane row removes the padding; the
    query gathers row base//fold and selects segment base%fold on the VPU.
    """
    X, Y, Z, C = grid.shape
    flat = pack_corners(grid)  # [T, 8C]
    t = flat.shape[0]
    pad = (-t) % fold
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, 8 * C), flat.dtype)])
    return flat.reshape((t + pad) // fold, fold * 8 * C)


def pack_corners_folded_chunked(
    grid: jnp.ndarray, fold: int, plane_chunk: int = 16
) -> jnp.ndarray:
    """:func:`pack_corners_folded` built in x-plane chunks.

    The one-shot path materializes the [T, 8*C] corner table before the fold
    reshape — on TPU that intermediate is lane-padded to 128, a 128/(8*C)-fold
    physical blowup (16.9GB for a 320^3 1-channel f32 bake, an OOM). Chunks
    of ``plane_chunk`` base x-planes keep the padded transient at
    plane_chunk*(Y+1)*(Z+1)*128*itemsize (<1GB) and concatenate pre-folded
    rows. Requires plane_chunk*(Y+1)*(Z+1) % fold == 0 (plane_chunk=16 works
    for any fold that divides 16).
    """
    X, Y, Z, C = grid.shape
    P = (Y + 1) * (Z + 1)
    assert (plane_chunk * P) % fold == 0, (plane_chunk, P, fold)
    padded = jnp.pad(grid, ((1, 1), (1, 1), (1, 1), (0, 0)))

    @jax.jit
    def one_chunk(pad_slab):
        # pad_slab: [plane_chunk+1, Y+2, Z+2, C] — base planes + right halo
        parts = [
            pad_slab[dx : dx + plane_chunk, dy : dy + Y + 1, dz : dz + Z + 1]
            for dx, dy, dz in CORNERS
        ]
        flat = jnp.concatenate(parts, axis=-1).reshape(plane_chunk * P, 8 * C)
        return flat.reshape((plane_chunk * P) // fold, fold * 8 * C)

    chunks = []
    for a in range(0, X + 1, plane_chunk):
        b = min(a + plane_chunk, X + 1)
        slab = padded[a : b + 1]
        if b - a < plane_chunk:  # pad the final partial chunk of planes
            slab = jnp.pad(
                slab, ((0, plane_chunk - (b - a)), (0, 0), (0, 0), (0, 0))
            )
        chunks.append(one_chunk(slab))
    out = jnp.concatenate(chunks)
    t_rows = -(-((X + 1) * P) // fold)
    return out[:t_rows]


def packed_trilerp_folded(
    table: jnp.ndarray,
    base_idx: jnp.ndarray,
    w: jnp.ndarray,
    channels: int,
    fold: int,
) -> jnp.ndarray:
    """Trilinear interpolation from a folded corner table.

    table [ceil(T/fold), fold*8*C], base_idx [...] (UNfolded row ids),
    w [..., 8] -> [..., C]."""
    rows = jnp.take(table, base_idx // fold, axis=0, mode="clip")
    rows = rows.reshape(*base_idx.shape, fold, 8, channels)
    seg = (base_idx % fold)[..., None, None]
    sel = jax.lax.broadcasted_iota(
        jnp.int32, (*base_idx.shape, fold, 1), len(base_idx.shape)
    ) == seg
    out_dtype = jnp.promote_types(table.dtype, jnp.float32)
    picked = jnp.sum(
        rows.astype(out_dtype) * sel.astype(out_dtype)[..., None], axis=-3
    )  # [..., 8, C]
    return jnp.einsum(
        "...kc,...k->...c", picked, w.astype(out_dtype)
    )


def grid_sample_3d_packed(grid: jnp.ndarray, xyz01: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ``ops.interp.grid_sample_3d`` through the packed engine.

    Pack-on-the-fly: only profitable when many queries amortize the packing
    (a training batch or a render). For a cached-table path, call
    :func:`pack_corners` once and :func:`packed_trilerp` per batch.
    """
    X, Y, Z, C = grid.shape
    base, w = corner_base_and_weights(xyz01, (X, Y, Z))
    return packed_trilerp(pack_corners(grid), base, w, C)
