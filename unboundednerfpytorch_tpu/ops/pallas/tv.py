"""Fused total-variation gradient injection as a Pallas TPU kernel.

Implements, in ONE pass over HBM, the semantics of the reference CUDA op
``total_variation_cuda.total_variation_add_grad``
(``/root/reference/FourierGrid/cuda/total_variation_kernel.cu:13-68``)
composed with the train-step gating (``train/step.py::add_tv_grads``):

    out = grad + gate * where(dense | grad != 0, tv_grad(param), 0)

where ``tv_grad[i] = sum_axes w_ax/6 * [clamp(p_i - p_{i+1}) + clamp(p_i -
p_{i-1})]`` (clamp to +-1, missing neighbors contribute 0).

Why a kernel: the XLA expression (ops/tv.py) runs at ~25 GB/s effective on
the flagship [7,160,160,160,12] bf16 grids (81 ms) because every padded
axis-shift materializes — 17x more HBM traffic than the 3-pass minimum
(read p, read g, write out; axpy measures 428 GB/s / 4.8 ms at this shape;
tools/probe_tv_cost.py). This kernel streams x-planes: the grid iterates
(bank, x), each program loads its plane plus the two x-neighbor planes via
clamped BlockSpec index maps, and the y/z neighbor diffs are sublane/lane
rolls on a merged [Y, Z*C] tile — no materialized shifted copies.

TV math runs in f32 inside the kernel regardless of grid dtype (the XLA
fallback computes in the param dtype, i.e. bf16 for bf16 grids — the kernel
is the *more* accurate of the two).

Used by ``make_train_step(tv_fused=...)``; production wiring picks it on
TPU when grids are not spatially sharded (the halo path keeps the XLA
expression, whose shifts XLA partitions across the `grid` mesh axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gate_ref, dense_ref, pc_ref, pp_ref, pn_ref, g_ref, out_ref,
            *, wx: float, wy: float, wz: float, X: int, C: int, bx: int):
    gate = gate_ref[0]
    dense = dense_ref[0]
    i = pl.program_id(1)

    pc = pc_ref[0].astype(jnp.float32)      # [bx, Y, ZC]
    prv = pp_ref[0, 0].astype(jnp.float32)  # plane x = i*bx - 1 (clamped)
    nxt = pn_ref[0, 0].astype(jnp.float32)  # plane x = i*bx + bx (clamped)
    g = g_ref[0]

    _, Y, ZC = pc.shape

    def clip(d):
        return jnp.clip(d, -1.0, 1.0)

    # x-axis: in-block shifted slices, boundary planes from the neighbor
    # inputs; global-end masks on the x index
    if bx > 1:
        up_x = jnp.concatenate([pc[1:], nxt[None]], axis=0)
        dn_x = jnp.concatenate([prv[None], pc[:-1]], axis=0)
    else:
        up_x, dn_x = nxt[None], prv[None]
    gx = i * bx + jax.lax.broadcasted_iota(jnp.int32, pc.shape, 0)
    acc = wx * (jnp.where(gx < X - 1, clip(pc - up_x), 0.0)
                + jnp.where(gx > 0, clip(pc - dn_x), 0.0))

    # y-axis: sublane rolls (pltpu.roll needs a non-negative shift;
    # roll by Y-1 == shift by -1)
    yi = jax.lax.broadcasted_iota(jnp.int32, pc.shape, 1)
    if Y > 1:
        up_y = pltpu.roll(pc, Y - 1, axis=1)
        dn_y = pltpu.roll(pc, 1, axis=1)
        acc = acc + wy * (jnp.where(yi < Y - 1, clip(pc - up_y), 0.0)
                          + jnp.where(yi > 0, clip(pc - dn_y), 0.0))

    # z-axis: lane rolls by +-C on the merged z*C axis; the roll is over the
    # LOGICAL lane width (Mosaic handles physical 128-padding)
    zi = jax.lax.broadcasted_iota(jnp.int32, pc.shape, 2)
    if ZC > C:
        up_z = pltpu.roll(pc, ZC - C, axis=2)
        dn_z = pltpu.roll(pc, C, axis=2)
        acc = acc + wz * (jnp.where(zi < ZC - C, clip(pc - up_z), 0.0)
                          + jnp.where(zi >= C, clip(pc - dn_z), 0.0))

    # keep = dense | (g != 0), in float arithmetic (Mosaic rejects the
    # scalar-bool | vector-bool relayout)
    gf = g.astype(jnp.float32)
    keep = jnp.maximum((gf != 0.0).astype(jnp.float32),
                       (dense != 0).astype(jnp.float32))
    out_ref[0] = (gf + acc * keep * gate).astype(out_ref.dtype)


def tv_add_grad(param: jnp.ndarray, grad: jnp.ndarray,
                wx: float, wy: float, wz: float,
                gate, dense, *, block_x: int | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """Fused ``grad + gate*where(dense | grad!=0, tv_grad(param), 0)``.

    param/grad: [..., X, Y, Z, C] (any leading bank axes). The /6 weight
    fold of the CUDA op happens here, matching ops/tv.py. gate/dense:
    traced scalars (bool or number).
    """
    assert param.shape == grad.shape, (param.shape, grad.shape)
    assert param.ndim >= 4, param.shape
    lead = param.shape[:-4]
    X, Y, Z, C = param.shape[-4:]
    B = 1
    for d in lead:
        B *= d

    p4 = param.reshape(B, X, Y, Z * C)
    g4 = grad.reshape(B, X, Y, Z * C)

    if block_x is None:
        # the kernel's ~4 live f32 whole-block temporaries must fit VMEM
        # (~16MB) alongside the double-buffered ins/outs; size by the
        # PADDED f32 plane (sublanes round to 8, lanes to 128). Measured on
        # v5e at [7,160,160,160,12] bf16: bx=2 compiles (13.1 ms) but the
        # odd-dim [7,159,...] case overflows scoped vmem by 96KB at bx=2,
        # and bx=4 exhausts VMEM outright — so the big-plane budget lands
        # on bx=1 (13.7 ms, within noise of bx=2)
        padded_zc = -(-(Z * C) // 128) * 128
        plane_f32 = -(-Y // 8) * 8 * padded_zc * 4
        block_x = max(1, min(X, 8, int(2.4e6 // max(plane_f32, 1))))
    bx = block_x

    blk = lambda im: pl.BlockSpec((1, bx, Y, Z * C), im,
                                  memory_space=pltpu.VMEM)
    plane = lambda im: pl.BlockSpec((1, 1, Y, Z * C), im,
                                    memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)

    kern = functools.partial(
        _kernel, wx=wx / 6.0, wy=wy / 6.0, wz=wz / 6.0, X=X, C=C, bx=bx
    )
    out = pl.pallas_call(
        kern,
        grid=(B, pl.cdiv(X, bx)),
        in_specs=[
            scalar,
            scalar,
            blk(lambda b, i: (b, i, 0, 0)),
            plane(lambda b, i: (b, jnp.maximum(i * bx - 1, 0), 0, 0)),
            plane(lambda b, i: (b, jnp.minimum(i * bx + bx, X - 1), 0, 0)),
            blk(lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=blk(lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(g4.shape, grad.dtype),
        interpret=interpret,
    )(
        jnp.asarray(gate, jnp.float32).reshape(1),
        jnp.asarray(dense, jnp.int32).reshape(1),
        p4, p4, p4, g4,
    )
    return out.reshape(grad.shape)


def make_tv_fused(mesh=None, *, interpret: bool = False):
    """Build the ``tv_fused`` callback for ``make_train_step``.

    With a mesh, the kernel runs replicated on every device via shard_map
    (params and grads are replicated in DP training; TV needs no
    communication). Returns f(param, grad, wx, wy, wz, gate, dense).
    """
    if mesh is None:
        def fn(param, grad, wx, wy, wz, gate, dense):
            return tv_add_grad(param, grad, wx, wy, wz, gate, dense,
                               interpret=interpret)
        return fn

    from jax.sharding import PartitionSpec as P

    def fn(param, grad, wx, wy, wz, gate, dense):
        inner = functools.partial(
            tv_add_grad, wx=wx, wy=wy, wz=wz, interpret=interpret
        )
        smapped = jax.shard_map(
            lambda p, g, gt, dn: inner(p, g, gate=gt, dense=dn),
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return smapped(param, grad, gate, dense)

    return fn
