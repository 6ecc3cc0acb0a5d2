"""Constant-baked EXACT renderer, sharded into per-bank executables.

The round-2 ``--constant_baked`` mode compiled the WHOLE two-stage render
program with all packed tables (5.97GB) as compile-time constants — 1.5-2x
the gather rate of argument tables (measured 72-96K rays/s exact), but the
single giant AOT compile broke the relay's compile transport in round 3
(>35 min, broken pipe). This module keeps the constant-gather win while
bounding every compile: the render pipeline is split into STAGES, and the
per-bank table constants land in SEPARATE executables of <=~0.9GB constant
each (7 density + 7 color + 3 glue programs), each compiled independently
(and cached by the persistent compilation cache, so per-scene cost is paid
once).

Pipeline per image (whole-image tensors; ``lax.map`` over fixed-size ray
blocks inside every stage bounds VMEM):

  A      rays -> contracted march -> occupancy probe -> per-ray
         ``sample_budget`` compaction                       (mask const)
  B[b]   selected points -> + bank b density (folded table const), b=0..2K
  C      density -> alpha -> transmittance scan -> weights threshold ->
         per-ray ``color_budget`` compaction                 (no consts)
  D[b]   surviving points -> + bank b k0 (packed table const)
  E      k0 mean -> rgb head (MLP consts) -> composite

Exactness: identical math to the two-stage cached forward
(``models/fourier_grid._forward_two_stage``) — only the *packaging* of the
tables (constants vs arguments) and the stage boundaries differ.

Reference bar being beaten: the CUDA renderer semantics at
``/root/reference/FourierGrid/cuda/render_utils_kernel.cu:576-651``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models import common
from unboundednerfpytorch_tpu.models import fourier_grid as fg
from unboundednerfpytorch_tpu.ops import alpha as alpha_ops
from unboundednerfpytorch_tpu.ops import packed as packed_ops
from unboundednerfpytorch_tpu.ops import rays as ray_ops
from unboundednerfpytorch_tpu.ops import sampling


def _blocked(fn, n_blocks: int, block: int):
    """Run fn over [n_blocks, block, ...] leading-axis blocks via lax.map."""

    def run(*args):
        return jax.lax.map(
            lambda xs: fn(*xs),
            tuple(a.reshape(n_blocks, block, *a.shape[1:]) for a in args),
        )

    return run


def make_staged_renderer(
    params: "fg.FourierGridParams",
    cfg: "fg.FourierGridConfig",
    cache: "fg.RenderCache",
    H: int,
    W: int,
    block: int = 8192,
    inverse_y: bool = False,
    flip_x: bool = False,
    flip_y: bool = False,
    const_max_bytes: int = 8 << 30,
):
    """Build the staged constant-baked renderer for one model + image size.

    ``cache`` must be the two-stage layout (``color_budget > 0``,
    ``density_bake_scale == 0`` for the exact path — a baked cache works too
    and stays color-exact). Returns ``render(K, c2w) -> (rgb, depth, bgmap)``
    numpy arrays; every stage executable is compiled (and persistently
    cached) on the first call.

    ``const_max_bytes``: tables larger than this are split into row-range
    sub-programs, each holding one contiguous slice as its constant and
    masking out-of-range samples. Measured relay transport cap
    (tools/probe_const_limit.py, 2026-08-20): 192MB constants compile, 320MB
    get HTTP 413 — so ~800MB per-bank k0 constants cannot ship whole.
    Every split re-gathers all samples (gather rows scale with the split
    count), so through a capped relay the splits erase the constant-gather
    rate advantage; on directly-attached TPUs leave ``const_max_bytes`` at
    its effectively-unsplit default to keep the round-2 72–96K rays/s form.
    """
    assert cache is not None and cache.density_tables is not None, (
        "staged constant rendering needs the two-stage cache layout "
        "(color_budget > 0)"
    )
    SB = cfg.sample_budget
    CB = min(cfg.color_budget, SB) if cfg.color_budget > 0 else SB
    assert SB > 0, "staged renderer requires the occupancy sample budget"
    thres = cfg.fast_color_thres
    assert thres > 0, "staged renderer requires fast_color_thres > 0"
    interval = cfg.stepsize * cfg.voxel_size_ratio_density
    n = H * W
    n_pad = (-n) % block
    n_total = n + n_pad
    n_blocks = n_total // block
    B = params.density.grid.shape[0]
    dims = params.density.grid.shape[1:4]
    d_dims = cache.density_dims or tuple(dims)
    d_freqs = cache.density_num_freqs
    mask_cache = params.mask_cache  # closed over -> constant (tiny)
    act_shift = float(np.asarray(params.act_shift))

    # --- stage A: march + probe + budget compaction -------------------------
    def _stage_a_block(ro, rd):
        pts, _inner, t = fg.sample_ray(cfg, ro, rd)
        S = pts.shape[1]
        stride = max(1, cfg.budget_probe_stride)
        if stride > 1:
            pre_s = mask_cache(pts[:, ::stride])
            pre = jnp.repeat(pre_s, stride, axis=1)[:, :S]
        else:
            pre = mask_cache(pts)
        sel, selm = sampling.compact_samples(pre, SB)
        stacked = jnp.concatenate(
            [pts, jnp.broadcast_to(t, (ro.shape[0], S))[..., None]], -1
        )
        g = sampling.gather_samples(stacked, sel)
        return g[..., :3], g[..., 3], selm

    stage_a = jax.jit(_blocked(_stage_a_block, n_blocks, block))

    def _row_splits(n_rows: int, bytes_per_row: int, align: int = 1):
        """Contiguous [r0, r1) ranges with r1-r0 aligned slices each under
        const_max_bytes."""
        max_rows = max(align, const_max_bytes // max(bytes_per_row, 1))
        max_rows -= max_rows % align
        max_rows = max(align, max_rows)
        out = []
        r0 = 0
        while r0 < n_rows:
            out.append((r0, min(n_rows, r0 + max_rows)))
            r0 += max_rows
        return out

    # --- stage B[b]: density accumulation (folded table constants) ----------
    def _make_stage_b(b: int, fr0: int, fr1: int):
        table = cache.density_tables[b][fr0:fr1]  # slice -> constant
        fold = cache.density_fold

        def one(acc_blk, pts_blk):
            c01 = fg._bank_coords01(cfg, pts_blk, num_freqs=d_freqs)
            nb = len(cache.density_tables)
            c01b = c01[..., min(b, c01.shape[-2] - 1), :] if nb > 1 else (
                c01[..., 0, :]
            )
            base, w = packed_ops.corner_base_and_weights(c01b, d_dims)
            fr = base // fold
            local = jnp.clip(base - fr0 * fold, 0, (fr1 - fr0) * fold - 1)
            v = packed_ops.packed_trilerp_folded(table, local, w, 1, fold)
            in_r = ((fr >= fr0) & (fr < fr1)).astype(v.dtype)
            return acc_blk + v[..., 0] * in_r

        return jax.jit(
            _blocked(one, n_blocks, block), donate_argnums=(0,)
        )

    stage_b = [
        _make_stage_b(b, fr0, fr1)
        for b in range(len(cache.density_tables))
        for fr0, fr1 in _row_splits(
            cache.density_tables[b].shape[0],
            cache.density_tables[b].shape[1]
            * cache.density_tables[b].dtype.itemsize,
        )
    ]

    # --- stage C: alpha/scan/threshold/color compaction ---------------------
    def _stage_c_block(density, t_sel, selm, pts_sel):
        alpha = alpha_ops.raw2alpha(density, act_shift, interval)
        mask = selm & (alpha > thres)
        weights, alphainv_last = alpha_ops.alpha2weights(alpha, mask=mask)
        mask = mask & (weights > thres)
        weights = weights * mask.astype(weights.dtype)
        sel2, sel2m = sampling.compact_samples(mask, CB)
        stacked = jnp.concatenate(
            [pts_sel, weights[..., None].astype(pts_sel.dtype)], -1
        )
        g = sampling.gather_samples(stacked, sel2)
        pts_c = g[..., :3]
        w_c = g[..., 3].astype(weights.dtype) * sel2m.astype(weights.dtype)
        s = 1.0 - 1.0 / (1.0 + t_sel)
        depth = jnp.sum(weights * s, axis=-1)
        return pts_c, w_c, alphainv_last, depth

    stage_c = jax.jit(_blocked(_stage_c_block, n_blocks, block))

    # --- stage D[b]: k0 accumulation (packed table constants) ---------------
    def _make_stage_d(b: int, r0: int, r1: int):
        table = cache.k0_tables[b][r0:r1]  # slice -> constant

        def one(acc_blk, pts_blk):
            c01 = fg._bank_coords01(cfg, pts_blk)
            base, w = packed_ops.corner_base_and_weights(c01[..., b, :], dims)
            local = jnp.clip(base - r0, 0, r1 - r0 - 1)
            v = packed_ops.packed_trilerp(table, local, w, cfg.k0_dim)
            in_r = ((base >= r0) & (base < r1)).astype(v.dtype)
            return acc_blk + v * in_r[..., None]

        return jax.jit(
            _blocked(one, n_blocks, block), donate_argnums=(0,)
        )

    stage_d = [
        _make_stage_d(b, r0, r1)
        for b in range(B)
        for r0, r1 in _row_splits(
            cache.k0_tables[b].shape[0],
            cache.k0_tables[b].shape[1] * cache.k0_tables[b].dtype.itemsize,
        )
    ]

    # --- stage E: rgb head + composite (tiny MLP constants) -----------------
    head_params = params  # rgbnet/vd/img_embeddings are small constants

    def _stage_e_block(k0_sum, w_c, alphainv_last, vd, bg):
        k0 = k0_sum / B
        rgb = fg._rgb_head(
            head_params, cfg, k0, vd, None, vd.shape[0], CB
        )
        marched = common.composite(w_c, rgb, alphainv_last, bg)
        return marched

    def _stage_e(k0_sum, w_c, alphainv_last, vd, bg):
        return jax.lax.map(
            lambda xs: _stage_e_block(*xs, bg),
            (
                k0_sum.reshape(n_blocks, block, CB, cfg.k0_dim),
                w_c.reshape(n_blocks, block, CB),
                alphainv_last.reshape(n_blocks, block),
                vd.reshape(n_blocks, block, 3),
            ),
        )

    stage_e = jax.jit(_stage_e, static_argnums=(4,))

    def render(K, c2w, bg: float = 1.0):
        ro, rd, vd = ray_ops.get_rays_of_a_view(
            H, W, jnp.asarray(K), jnp.asarray(c2w),
            inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
        )
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        vd = vd.reshape(-1, 3)
        if n_pad:
            pad = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], n_pad, axis=0)]
            )
            ro, rd, vd = pad(ro), pad(rd), pad(vd)

        pts_sel, t_sel, selm = stage_a(ro, rd)
        density = jnp.zeros((n_blocks, block, SB), jnp.float32)
        for fn in stage_b:
            density = fn(density.reshape(n_total, SB),
                         pts_sel.reshape(n_total, SB, 3))
        # mean over BANKS (stage_b may hold several row-range splits per
        # bank; out-of-range splits contribute exact zeros)
        density = density.reshape(n_blocks, block, SB) / len(
            cache.density_tables
        )
        pts_c, w_c, alphainv_last, depth = stage_c(
            density.reshape(n_total, SB),
            t_sel.reshape(n_total, SB),
            selm.reshape(n_total, SB),
            pts_sel.reshape(n_total, SB, 3),
        )
        k0_sum = jnp.zeros((n_blocks, block, CB, cfg.k0_dim), jnp.float32)
        for fn in stage_d:
            k0_sum = fn(k0_sum.reshape(n_total, CB, cfg.k0_dim),
                        pts_c.reshape(n_total, CB, 3))
        rgb = stage_e(
            k0_sum.reshape(n_total, CB, cfg.k0_dim),
            w_c.reshape(n_total, CB),
            alphainv_last.reshape(n_total),
            vd,
            float(bg),
        )
        rgb = np.asarray(rgb).reshape(-1, 3)[:n].reshape(H, W, 3)
        depth_np = np.asarray(depth).reshape(-1)[:n].reshape(H, W)
        bgmap = np.asarray(alphainv_last).reshape(-1)[:n].reshape(H, W)
        return rgb, depth_np, bgmap

    return render
