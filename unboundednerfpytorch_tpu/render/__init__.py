"""Rendering & evaluation (L6)."""

from unboundednerfpytorch_tpu.render.renderer import (
    depth_to_vis,
    render_image,
    render_viewpoints,
)


def write_video(path: str, frames, fps: int = 30) -> str:
    """mp4 via imageio-ffmpeg, falling back to a PNG frame directory when no
    video backend is available (a long render must never die at the final
    write). Returns the artifact path actually written."""
    import os

    import numpy as np

    frames = np.asarray(frames)
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps, quality=8)
        return path
    except Exception as e:  # noqa: BLE001 — missing ffmpeg/pyav backend
        import imageio.v2 as imageio

        if os.path.exists(path):
            os.remove(path)  # a mid-write failure leaves a corrupt container
        outdir = os.path.splitext(path)[0] + "_frames"
        os.makedirs(outdir, exist_ok=True)
        for i, f in enumerate(frames):
            imageio.imwrite(os.path.join(outdir, f"{i:04d}.png"), f)
        print(f"video backend unavailable ({type(e).__name__}); wrote "
              f"{len(frames)} frames to {outdir} instead of {path}")
        return outdir


def run_render(args, cfg, data_dict, exp_dir: str) -> None:
    """Post-train render program (run_render.py:117-316): load fine_last,
    render train/test/video splits, dump pngs + metrics."""
    import os

    import numpy as np

    from unboundednerfpytorch_tpu.train.loop import make_forward
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt
    from unboundednerfpytorch_tpu.utils import metrics as M

    # block path (run_render.py:146-207): prefer a merged ckpt; without one,
    # but with per-block ckpts, render each block's train slice separately
    merged = os.path.join(exp_dir, "fine_last_merged")
    block0 = os.path.join(exp_dir, "fine_last_0")
    path = os.path.join(exp_dir, "fine_last")
    if getattr(args, "ft_path", ""):
        # explicit checkpoint (run_FourierGrid.py --ft_path) — also how a
        # baked export (`--program export_baked`) is served
        path = args.ft_path
    elif os.path.exists(os.path.join(merged, "meta.json")):
        path = merged
    elif not os.path.exists(os.path.join(path, "meta.json")) and os.path.exists(
        os.path.join(block0, "meta.json")
    ):
        return run_render_blocks(args, cfg, data_dict, exp_dir)
    family, mcfg, params, _, _ = ckpt.load_model(path)
    if str(path).endswith(".tar"):
        # reference checkpoints carry no render-time knobs — the scene
        # config's values (stepsize/t_boundary/budgets) must win
        from unboundednerfpytorch_tpu.utils.reference_import import (
            overlay_render_knobs,
        )

        mcfg = overlay_render_knobs(mcfg, cfg.fine_model_and_render)
    render_kwargs = {
        "near": float(data_dict["near"]),
        "far": float(data_dict["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "stepsize": cfg.fine_model_and_render.stepsize,
    }
    cache = None
    if family in ("dvgo", "dcvgo", "dmpigo"):
        import importlib

        mod = importlib.import_module(
            f"unboundednerfpytorch_tpu.models.{family}"
        )
        cache = mod.build_render_cache(params, mcfg)
    if family == "FourierGrid":
        from unboundednerfpytorch_tpu.models import fourier_grid as fg

        if getattr(args, "bake_render", False) and mcfg.fourier_freq_num > 0:
            # SNeRG-style single-bank bake: ~7x fewer gather rows,
            # approximate (fourier_grid.bake_for_rendering docstring)
            params, mcfg = fg.bake_for_rendering(
                params, mcfg, scale=getattr(args, "bake_scale", 1.26)
            )
            print(f"baked render grids: {mcfg.world_size_density} single-bank")
        if getattr(args, "auto_budget", False) and mcfg.sample_budget > 0:
            # occupancy-adaptive budgets (VERDICT r4 #2): size the render
            # budgets from THIS scene's measured per-ray statistics and
            # enable the hierarchical probe when the mask is sparse —
            # the render-time analog of the reference's dynamic
            # fast_color_thres sparsity
            import dataclasses as _dc

            import jax.numpy as _jnp

            from unboundednerfpytorch_tpu.ops import rays as _ray_ops

            i_probe = np.asarray(data_dict["i_train"]).reshape(-1)[:4]
            ro_l, rd_l, vd_l = [], [], []
            for i in i_probe:
                Hs, Ws = (int(v) for v in np.asarray(data_dict["HW"])[i])
                ro, rd, vd = _ray_ops.get_rays_of_a_view(
                    Hs, Ws, _jnp.asarray(data_dict["Ks"][i]),
                    _jnp.asarray(data_dict["poses"][i][:3, :4]),
                )
                sl = slice(0, Hs * Ws, max(1, (Hs * Ws) // 1024))
                ro_l.append(ro.reshape(-1, 3)[sl])
                rd_l.append(rd.reshape(-1, 3)[sl])
                vd_l.append(vd.reshape(-1, 3)[sl])
            rec = fg.suggest_budgets(
                params, mcfg, _jnp.concatenate(ro_l),
                _jnp.concatenate(rd_l), _jnp.concatenate(vd_l), chunk=1024,
            )
            occ = float(np.mean(np.asarray(params.mask_cache.mask)))
            knobs = {
                "sample_budget": rec["sample_budget"],
                "color_budget": (
                    rec["color_budget"] if mcfg.color_budget > 0 else 0
                ),
            }
            if occ < 0.45:
                knobs["probe_coarse_stride"] = rec["probe_coarse_stride"]
                knobs["probe_candidate_groups"] = rec["probe_candidate_groups"]
            mcfg = _dc.replace(mcfg, **knobs)
            print(
                f"auto budgets (occupancy {occ:.3f}): sample "
                f"{rec['sample_budget']}, color {rec['color_budget']}, "
                f"hierarchical probe {'on' if occ < 0.45 else 'off'}"
            )
        cache = fg.build_render_cache(params, mcfg)
    fwd_core = make_forward(family, mcfg, render_kwargs, cache=cache)
    image_fn = None
    if getattr(args, "constant_baked", False):
        # tables as compile-time CONSTANTS: XLA folds layouts/packing into
        # the executable (1.5-2.2x the argument-path gather rate, exact).
        # FourierGrid two-stage caches go through the STAGED renderer
        # (render/staged_const.py): per-bank table constants land in
        # separate <=~0.9GB-constant executables, so every compile stays
        # small (the round-3 single 5.97GB-constant program broke the relay
        # compile transport). The persistent compilation cache makes the
        # per-scene compile one-time either way.
        fwd = lambda ro, rd, vd: fwd_core(params, ro, rd, vd, None, cache=cache)
        aux = None
        if (
            family == "FourierGrid"
            and cache is not None
            and getattr(cache, "density_tables", None) is not None
            and mcfg.sample_budget > 0
            and mcfg.fast_color_thres > 0
        ):
            from unboundednerfpytorch_tpu.render import staged_const

            staged = {}

            def image_fn(H, W, K, c2w, _s=staged):
                if (H, W) not in _s:
                    _s[(H, W)] = staged_const.make_staged_renderer(
                        params, mcfg, cache, H, W,
                        inverse_y=cfg.data.inverse_y,
                        flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
                    )
                return _s[(H, W)](K, c2w, bg=render_kwargs["bg"])
    else:
        # params + packed tables ride as jit arguments (renderer aux) — no
        # bake-in, compiles in seconds against abstract shapes
        fwd = lambda aux, ro, rd, vd: fwd_core(
            aux[0], ro, rd, vd, None, cache=aux[1]
        )
        aux = (params, cache)

    # optional ARF stylization of the render set (run_render.py:119-122,170-172)
    stylizer = None
    style_root = getattr(args, "style_root", None)
    if style_root:
        from unboundednerfpytorch_tpu.render.arf import ARF

        H0, W0 = (int(v) for v in np.asarray(data_dict["HW"])[0])
        stylizer = ARF(style_root, getattr(args, "style_id", 0), H0, W0)

    # cooperative multi-chip rendering: shard each chunk's rays over a
    # `data` mesh axis (model state replicated) when >1 device is visible.
    # Constant-baked mode stays single-program (tables are compile-time
    # constants of one executable).
    import jax as _jax

    mesh = None
    if len(_jax.devices()) > 1 and aux is not None:
        from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh()
        print(f"render: cooperative over {mesh.devices.size} devices")

    splits = []
    if getattr(args, "render_train", False):
        splits.append(("train", data_dict["i_train"], None))
    if getattr(args, "render_test", True) or not splits:
        splits.append(("test", data_dict["i_test"], None))
    if getattr(args, "render_video", False) and data_dict.get("render_poses") is not None:
        splits.append(("video", None, np.asarray(data_dict["render_poses"])))

    for name, idx, poses_override in splits:
        if poses_override is not None:
            poses = poses_override
            HW = np.repeat(np.asarray(data_dict["HW"])[:1], len(poses), axis=0)
            Ks = np.repeat(np.asarray(data_dict["Ks"])[:1], len(poses), axis=0)
            gt = None
        else:
            idx = np.asarray(idx)
            if idx.size == 0:
                continue
            poses = np.asarray(data_dict["poses"])[idx]
            HW = np.asarray(data_dict["HW"])[idx]
            Ks = np.asarray(data_dict["Ks"])[idx]
            gt = (
                np.asarray(data_dict["images"])[idx]
                if data_dict.get("images") is not None
                else None
            )
        out = render_viewpoints(
            fwd,
            poses=poses,
            HW=HW,
            Ks=Ks,
            gt_imgs=gt,
            ndc=cfg.data.ndc,
            inverse_y=cfg.data.inverse_y,
            flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y,
            eval_lpips=(getattr(args, "eval_lpips", False)
                        or getattr(args, "eval_lpips_vgg", False)),
            lpips_nets=tuple(
                net for net, on in (
                    ("alex", getattr(args, "eval_lpips", False)),
                    ("vgg", getattr(args, "eval_lpips_vgg", False)),
                ) if on
            ) or ("alex",),
            aux=aux,
            mesh=mesh,
            image_fn=image_fn,
            render_factor=(getattr(args, "render_video_factor", 0)
                           if name == "video" else 0),
            render_video_flipy=(getattr(args, "render_video_flipy", False)
                                if name == "video" else False),
            render_video_rot90=(getattr(args, "render_video_rot90", 0)
                                if name == "video" else 0),
        )
        rgbs = out["rgbs"]
        if stylizer is not None and len(rgbs):
            rgbs, _ = stylizer.match_colors_for_image_set(rgbs, exp_dir)
        if getattr(args, "dump_images", False):
            import imageio.v2 as imageio

            outdir = os.path.join(exp_dir, f"render_{name}")
            os.makedirs(outdir, exist_ok=True)
            for i, rgb in enumerate(rgbs):
                imageio.imwrite(
                    os.path.join(outdir, f"{i:03d}.png"), M.to8b(rgb)
                )
                imageio.imwrite(
                    os.path.join(outdir, f"{i:03d}_depth.png"),
                    depth_to_vis(out["depths"][i]),
                )
        if name == "video" and len(rgbs):
            write_video(
                os.path.join(exp_dir, "render_video.mp4"), M.to8b(rgbs)
            )
            write_video(
                os.path.join(exp_dir, "render_video_depth.mp4"),
                np.stack([depth_to_vis(d) for d in out["depths"]]),
            )
        if out["psnrs"]:
            print(f"{name}: psnr {np.mean(out['psnrs']):.2f}")


def run_render_blocks(args, cfg, data_dict, exp_dir: str) -> None:
    """Per-block rendering path (run_render.py:146-207): load each block's
    fine_last_{i}, render its slice of the train views, concatenate into one
    video."""
    import glob
    import os

    import numpy as np

    from unboundednerfpytorch_tpu.train.loop import make_forward
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt
    from unboundednerfpytorch_tpu.utils import metrics as M

    block_paths = sorted(glob.glob(os.path.join(exp_dir, "fine_last_[0-9]*")))
    i_train = np.asarray(data_dict["i_train"])
    per_block = int(np.ceil(len(i_train) / max(len(block_paths), 1)))
    render_kwargs = {
        "near": float(data_dict["near"]),
        "far": float(data_dict["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "stepsize": cfg.fine_model_and_render.stepsize,
    }
    all_rgbs, psnrs = [], []
    for b, path in enumerate(block_paths):
        family, mcfg, params, _, _ = ckpt.load_model(path)
        cache = None
        if family == "FourierGrid":
            from unboundednerfpytorch_tpu.models import fourier_grid as fg

            cache = fg.build_render_cache(params, mcfg)
        fwd_core = make_forward(family, mcfg, render_kwargs, cache=cache)
        fwd = lambda aux, ro, rd, vd, _f=fwd_core: _f(
            aux[0], ro, rd, vd, None, cache=aux[1]
        )
        idx = i_train[b * per_block : (b + 1) * per_block]
        if idx.size == 0:
            continue
        out = render_viewpoints(
            fwd,
            poses=np.asarray(data_dict["poses"])[idx],
            HW=np.asarray(data_dict["HW"])[idx],
            Ks=np.asarray(data_dict["Ks"])[idx],
            gt_imgs=(
                np.asarray(data_dict["images"])[idx]
                if data_dict.get("images") is not None else None
            ),
            ndc=cfg.data.ndc, inverse_y=cfg.data.inverse_y,
            flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
            verbose=False,
            aux=(params, cache),
        )
        all_rgbs.append(out["rgbs"])
        psnrs.extend(out["psnrs"])
        print(f"block {b}: rendered {len(idx)} views")
    if all_rgbs:
        video = np.concatenate(all_rgbs)
        write_video(
            os.path.join(exp_dir, "render_blocks.mp4"), M.to8b(video), fps=15
        )
        if psnrs:
            print(f"blocks: psnr {np.mean(psnrs):.2f}")


def export_coarse_geometry(cfg, exp_dir: str, out_path: str = "") -> None:
    """Coarse alpha/rgb volume export (run_export_coarse.py:7-20);
    ``out_path`` overrides the default location (run_export_coarse.py:19)."""
    import os

    import numpy as np
    import jax

    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt

    path = os.path.join(exp_dir, "coarse_last")
    if not os.path.exists(path):
        path = os.path.join(exp_dir, "fine_last")
    family, mcfg, params, _, _ = ckpt.load_model(path)
    import importlib

    mod = importlib.import_module(ckpt._FAMILY_MODULES[family])
    dense = params.density.get_dense_grid()
    if dense.ndim == 5:
        dense = dense.mean(0)
    alpha = np.asarray(mod.activate_density(params, mcfg, dense[..., 0]))
    rgb = np.asarray(jax.nn.sigmoid(params.k0.get_dense_grid()))
    if rgb.ndim == 5:
        rgb = rgb.mean(0)
    out = out_path or os.path.join(exp_dir, "coarse_volume.npz")
    np.savez_compressed(out, alpha=alpha, rgb=rgb[..., :3])
    print(f"exported coarse geometry to {out}")


__all__ = [
    "render_image",
    "render_viewpoints",
    "depth_to_vis",
    "run_render",
    "export_coarse_geometry",
]
