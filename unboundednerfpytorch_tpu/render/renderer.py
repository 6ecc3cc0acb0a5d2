"""Full-image rendering + evaluation (L6).

Re-implements ``render_viewpoints`` / ``run_render``
(``/root/reference/FourierGrid/run_render.py:14-114``): per-pose ray
generation, chunked forward passes, PSNR/SSIM/LPIPS accumulation, depth
visualization. Chunks are fixed-size (pad the last) so the jitted render
function compiles once.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.ops import rays as ray_ops
from unboundednerfpytorch_tpu.utils import metrics as M

DEFAULT_CHUNK = 8192  # the reference's render chunk (run_render.py:54)

_BATCHED_CACHE: dict = {}


def _batched_renderer(forward_fn, chunk: int, n_chunks: int, has_aux: bool,
                      mesh=None):
    """Jitted whole-image renderer, cached per (forward_fn, chunk, n_chunks)
    so repeated views reuse the executable.

    With ``has_aux``, model state (params/render cache) is threaded through
    as a jit ARGUMENT instead of a captured closure constant — capturing
    multi-GB packed tables as constants bakes them into the executable and
    inflates compile time by minutes (measured: 5.97GB captured, ~470s
    compile for the 160^3 two-stage cache). The aux input is compiled with
    AUTO layouts and device_put into the executable's preferred format once
    — otherwise XLA inserts a full layout-change copy of the tables at every
    call (measured: a 6.84GB HBM copy of the k0 tables -> OOM)."""
    key = (id(forward_fn), chunk, n_chunks, has_aux, id(mesh))
    if key in _BATCHED_CACHE:
        return _BATCHED_CACHE[key]

    def render_all(aux, ro, rd, vd):
        def one(c):
            if has_aux:
                res = forward_fn(aux, c[0], c[1], c[2])
            else:
                res = forward_fn(c[0], c[1], c[2])
            return res.rgb_marched, res.depth, res.alphainv_last

        return jax.lax.map(
            one,
            (
                ro.reshape(n_chunks, chunk, 3),
                rd.reshape(n_chunks, chunk, 3),
                vd.reshape(n_chunks, chunk, 3),
            ),
        )

    if mesh is not None:
        # distributed rendering: shard each chunk's ray axis over the data
        # mesh axis (model state replicated; rays are embarrassingly
        # parallel, so no collectives beyond the final gather of outputs)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ray_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        jfn = jax.jit(
            render_all, in_shardings=(rep, ray_sh, ray_sh, ray_sh),
        )

        def call(aux, ro, rd, vd):
            return jfn(aux, ro, rd, vd)

    elif has_aux and jax.default_backend() == "tpu":
        from jax.experimental.layout import Format, Layout

        jfn = jax.jit(
            render_all,
            in_shardings=(Format(Layout.AUTO), None, None, None),
        )
        state = {}

        def ensure_compiled(aux, ro, rd, vd):
            if "compiled" not in state:
                # Layout.AUTO lowering accepts only ABSTRACT leaves — a
                # direct render_image call passes concrete arrays, so
                # shape-abstract them here (callers that pre-negotiated via
                # aux_format() hit the cache and never reach this path)
                aux_abs = jax.tree.map(
                    lambda x: (
                        jax.ShapeDtypeStruct(x.shape, x.dtype)
                        if isinstance(x, jax.Array) else x
                    ),
                    aux,
                )
                compiled = jfn.lower(aux_abs, ro, rd, vd).compile()
                state["compiled"] = compiled
                state["aux_fmt"] = compiled.input_formats[0][0]
            return state["aux_fmt"]

        def call(aux, ro, rd, vd):
            ensure_compiled(aux, ro, rd, vd)
            # no-op when aux is already in the preferred layout (it is, when
            # the caller built it via aux_format()+out_shardings)
            aux_opt = jax.device_put(aux, state["aux_fmt"])
            return state["compiled"](aux_opt, ro, rd, vd)

        call.ensure_compiled = ensure_compiled
    else:
        call = jax.jit(render_all)

    # bound the id()-keyed cache (function objects can be GC'd and ids reused)
    if len(_BATCHED_CACHE) > 64:
        _BATCHED_CACHE.clear()
    _BATCHED_CACHE[key] = call
    return call


def aux_format(
    forward_fn: Callable,
    aux_shapes,
    H: int,
    W: int,
    chunk: int = DEFAULT_CHUNK,
):
    """The renderer executable's preferred layout for its aux input.

    Compiles the whole-image render program against ABSTRACT shapes
    (jax.ShapeDtypeStruct pytree for aux) so callers can build multi-GB
    model state (packed tables) DIRECTLY in the final layout via
    ``jax.jit(builder, out_shardings=<format subtree>)`` — avoiding the
    transient old+new copy that a post-hoc relayout costs (a ~12GB HBM
    spike for the 160^3 two-stage cache, which OOMs a 16GB chip).
    Returns None off-TPU. The compile is cached and reused by the
    subsequent render_image calls with the same (forward_fn, chunk,
    n_chunks)."""
    if jax.default_backend() != "tpu":
        return None
    n = H * W
    n_chunks = -(-n // chunk)
    batched = _batched_renderer(forward_fn, chunk, n_chunks, True)
    rays = jax.ShapeDtypeStruct((n_chunks * chunk, 3), jnp.float32)
    return batched.ensure_compiled(aux_shapes, rays, rays, rays)


def render_image(
    forward_fn: Callable,
    H: int,
    W: int,
    K,
    c2w,
    *,
    ndc: bool = False,
    inverse_y: bool = False,
    flip_x: bool = False,
    flip_y: bool = False,
    chunk: int = DEFAULT_CHUNK,
    aux=None,
    mesh=None,
    rays_fn=None,
):
    """Render one view. forward_fn(ro, rd, vd) -> RenderResult (jitted by
    the caller or here on first use). Returns (rgb [H,W,3], depth [H,W],
    alphainv_last [H,W]) as numpy.

    ``rays_fn``: optional whole-image override — called as
    rays_fn(ro, rd, vd) with flat padded rays and must return (rgb, depth,
    alphainv_last). Used for host-coordinated render drivers (e.g.
    fourier_grid.render_rays_adaptive) that cannot live inside one jit.

    ``mesh``: optional jax Mesh with a `data` axis — each chunk's rays are
    sharded across it (model state replicated), so a multi-chip slice
    renders one image cooperatively.

    ``aux``: optional pytree of model state (params, RenderCache, ...). When
    given, forward_fn is called as forward_fn(aux, ro, rd, vd) and aux rides
    as a jit argument — REQUIRED for large models, or the tables get baked
    into the executable as constants (minutes of extra compile)."""
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, jnp.asarray(K), jnp.asarray(c2w),
        ndc=ndc, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
    )
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    vd = vd.reshape(-1, 3)
    n = ro.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        pad = lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], n_pad, axis=0)])
        ro, rd, vd = pad(ro), pad(rd), pad(vd)
    n_chunks = ro.shape[0] // chunk

    # one dispatch for the whole image: lax.map over fixed-size chunks keeps
    # the device busy and amortizes per-call dispatch latency (a host loop
    # costs ~25ms/chunk through remote runtimes)
    if rays_fn is not None:
        rgbs, depths, bgws = rays_fn(ro, rd, vd)
    else:
        batched = _batched_renderer(
            forward_fn, chunk, n_chunks, aux is not None, mesh=mesh
        )
        rgbs, depths, bgws = batched(aux, ro, rd, vd)
    rgb = np.asarray(rgbs).reshape(-1, 3)[:n].reshape(H, W, 3)
    depth = np.asarray(depths).reshape(-1)[:n].reshape(H, W)
    bgw = np.asarray(bgws).reshape(-1)[:n].reshape(H, W)
    return rgb, depth, bgw


def render_viewpoints(
    forward_fn: Callable,
    poses,
    HW,
    Ks,
    *,
    gt_imgs=None,
    ndc: bool = False,
    inverse_y: bool = False,
    flip_x: bool = False,
    flip_y: bool = False,
    chunk: int = DEFAULT_CHUNK,
    eval_ssim: bool = True,
    eval_lpips: bool = False,
    lpips_nets: tuple = ("alex",),
    verbose: bool = True,
    log_fn=print,
    aux=None,
    mesh=None,
    render_factor: float = 0,
    render_video_flipy: bool = False,
    render_video_rot90: int = 0,
    image_fn=None,
):
    """Render a split of poses and (optionally) evaluate vs ground truth.

    ``render_factor``: downsample H/W/K by this factor for fast previews
    (run_render.py:35-41); GT metrics are skipped (sizes differ).
    ``render_video_flipy`` / ``render_video_rot90``: post-transforms of the
    rendered stack (run_render.py:93-103).

    Returns dict(rgbs, depths, bgmaps, psnrs, ssims, lpips) — ``lpips`` is
    a list of per-view {net: value} dicts (one key per requested net).
    """
    HW = np.asarray(HW)
    Ks = np.asarray(Ks, np.float64)
    if render_factor:
        HW = (HW / render_factor).astype(int)
        Ks = Ks.copy()
        Ks[:, :2, :3] /= render_factor
        gt_imgs = None
    rgbs, depths, bgmaps = [], [], []
    psnrs, ssims, lpips_vals = [], [], []
    lpips_skipped = False
    for i, c2w in enumerate(np.asarray(poses)):
        H, W = (int(v) for v in np.asarray(HW)[i])
        K = np.asarray(Ks)[i]
        if image_fn is not None:
            # whole-image override (e.g. the staged constant-baked
            # renderer, render/staged_const.py): takes (H, W, K, c2w)
            rgb, depth, bgw = image_fn(H, W, K, c2w[:3, :4])
        else:
            rgb, depth, bgw = render_image(
                forward_fn, H, W, K, c2w[:3, :4],
                ndc=ndc, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
                chunk=chunk, aux=aux, mesh=mesh,
            )
        rgbs.append(rgb)
        depths.append(depth)
        bgmaps.append(bgw)
        if gt_imgs is not None:
            gt = np.asarray(gt_imgs[i])
            psnrs.append(M.psnr(rgb, gt))
            if eval_ssim:
                ssims.append(M.rgb_ssim(rgb, gt, max_val=1.0))
            if eval_lpips:
                try:
                    lpips_vals.append({
                        net: M.rgb_lpips(gt, rgb, net_name=net)
                        for net in lpips_nets
                    })
                except ImportError:
                    # never SILENTLY omit a README-table metric (the
                    # reference always evaluates LPIPS, utils.py:128-140):
                    # record the skip and announce it in the summary below
                    lpips_skipped = True
    if render_video_flipy:
        rgbs = [r[::-1] for r in rgbs]
        depths = [d[::-1] for d in depths]
        bgmaps = [b[::-1] for b in bgmaps]
    if render_video_rot90:
        k = int(render_video_rot90)
        rgbs = [np.rot90(r, k=k, axes=(0, 1)) for r in rgbs]
        depths = [np.rot90(d, k=k, axes=(0, 1)) for d in depths]
        bgmaps = [np.rot90(b, k=k, axes=(0, 1)) for b in bgmaps]
    if gt_imgs is not None and verbose:
        log_fn(f"render eval: psnr {np.mean(psnrs):.2f}")
        if ssims:
            log_fn(f"render eval: ssim {np.mean(ssims):.4f}")
        if lpips_vals:
            for net in lpips_vals[0]:
                log_fn(
                    f"render eval: lpips/{net} "
                    f"{np.mean([v[net] for v in lpips_vals]):.4f}"
                )
    if gt_imgs is not None and lpips_skipped:
        log_fn(
            "render eval: LPIPS SKIPPED (optional `lpips` package absent; "
            "the reference README tables include it — install `lpips` to "
            "restore the metric, see BASELINE.md)"
        )
    return {
        "rgbs": np.stack(rgbs) if rgbs else np.zeros((0,)),
        "depths": np.stack(depths) if depths else np.zeros((0,)),
        "bgmaps": np.stack(bgmaps) if bgmaps else np.zeros((0,)),
        "psnrs": psnrs,
        "ssims": ssims,
        "lpips": lpips_vals,
    }


def depth_to_vis(depth: np.ndarray, p_low: float = 2.0, p_high: float = 98.0):
    """Percentile-normalized depth visualization (run_render.py:308-315)."""
    lo, hi = np.percentile(depth, [p_low, p_high])
    x = np.clip((depth - lo) / max(hi - lo, 1e-8), 0, 1)
    return (255 * x).astype(np.uint8)
