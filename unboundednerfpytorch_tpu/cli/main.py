"""CLI driver (L7).

Re-implements ``/root/reference/run_FourierGrid.py``: argparse surface,
config load, seeding, block-count computation, and program dispatch
(train | render | export_bbox | export_coarse | gen_trace | linemod_eval |
sfm | tune_pose). ``sfm`` actually runs (COLMAP driver + poses_bounds.npy,
the imgs2poses pipeline) and ``tune_pose`` actually refines poses by
backprop through the frozen model (train/pose_tune.py) — the reference
accepts both but raises NotImplementedError (run_FourierGrid.py:122-123).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="unboundednerfpytorch_tpu driver")
    p.add_argument("--config", required=True, help="scene config file path")
    p.add_argument(
        "--program",
        default="train",
        choices=[
            "export_bbox",
            "export_coarse",
            "render",
            "train",
            "gen_trace",
            "linemod_eval",
            "sfm",
            "tune_pose",
            "export_baked",
        ],
    )
    p.add_argument("--pose_preds", default="",
                   help="linemod_eval: path to [N,3,4] predicted poses (.npy)")
    p.add_argument("--tune_steps", type=int, default=400,
                   help="tune_pose: optimization steps")
    p.add_argument("--tune_lr", type=float, default=1e-3,
                   help="tune_pose: Adam lr on the se(3) deltas")
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--sample_num", type=int, default=-1,
                   help="truncate dataset for fast debugging")
    p.add_argument("--num_per_block", type=int, default=-1,
                   help="images per block for block training")
    p.add_argument("--running_block_id", type=int, default=-1)
    p.add_argument("--block_parallel", action="store_true",
                   help="train all blocks concurrently as one stacked-SPMD "
                        "program sharded over a `block` mesh axis "
                        "(train/block_parallel.py) instead of sequentially")
    p.add_argument("--no_reload", action="store_true")
    p.add_argument("--no_reload_optimizer", action="store_true",
                   help="on resume, rebuild fresh Adam moments instead of "
                        "restoring them (run_FourierGrid.py:36-37)")
    p.add_argument("--ft_path", default="")
    p.add_argument("--export_cam", action="store_true")
    p.add_argument("--export_geometry", action="store_true")
    p.add_argument("--export_bbox_and_cams_only", default="",
                   help="output path for --program export_bbox "
                        "(run_export_bbox.py:14)")
    p.add_argument("--export_coarse_only", default="",
                   help="output path for --program export_coarse "
                        "(run_export_coarse.py:19)")
    p.add_argument("--save_train_imgs", action="store_true",
                   help="dump the training images into the exp folder")
    p.add_argument("--diffuse", action="store_true",
                   help="swap training images for diffusion-generated "
                        "replacements per the config's `diffusion` dict "
                        "(load_waymo.py:287-293)")
    p.add_argument("--render_only", action="store_true",
                   help="do not optimize; reload weights and render "
                        "(run_FourierGrid.py:45) — alias for --program render")
    p.add_argument("--render_train", action="store_true")
    p.add_argument("--render_test", action="store_true")
    p.add_argument("--render_video", action="store_true")
    p.add_argument("--render_video_flipy", action="store_true")
    p.add_argument("--render_video_rot90", type=int, default=0)
    p.add_argument("--render_video_factor", type=float, default=0,
                   help="downsampling factor for fast render previews "
                        "(4 or 8); GT metrics are skipped")
    p.add_argument("--eval_ssim", action="store_true", default=True)
    p.add_argument("--eval_lpips", "--eval_lpips_alex", dest="eval_lpips",
                   action="store_true",
                   help="LPIPS (AlexNet) eval; reference --eval_lpips_alex")
    p.add_argument("--eval_lpips_vgg", action="store_true",
                   help="LPIPS (VGG) eval")
    p.add_argument("--i_print", type=int, default=500)
    p.add_argument("--i_weights", type=int, default=0,
                   help="periodic checkpoint cadence in steps (0 = stage end only)")
    p.add_argument("--dump_images", action="store_true")
    p.add_argument("--style_root", default="",
                   help="ARF style image dir (enables stylized rendering)")
    p.add_argument("--style_id", default="0")
    p.add_argument("--bake_render", action="store_true",
                   help="bake the Fourier banks into a single-bank grid "
                        "before rendering (APPROXIMATE, ~7x fewer gather "
                        "rows; fourier_grid.bake_for_rendering)")
    p.add_argument("--bake_scale", type=float, default=1.26,
                   help="linear resolution multiplier for --bake_render")
    p.add_argument("--auto_budget", action="store_true",
                   help="size the render sample/color budgets from this "
                        "scene's measured per-ray occupancy statistics and "
                        "enable the hierarchical occupancy probe when the "
                        "mask is sparse (fourier_grid.suggest_budgets) — "
                        "big speedups on converged/sparse scenes, exactness "
                        "tracked by the budgets' far-tail-truncation "
                        "contract")
    p.add_argument("--grid_parallel", type=int, default=1,
                   help="shard voxel grids (+ Adam moments) spatially over a "
                        "`grid` mesh axis of this size — for >HBM grids "
                        "(halo-exchange sampling); rays stay data-parallel "
                        "over the remaining devices")
    p.add_argument("--visualize_poses", action="store_true",
                   help="debug pose-visualization mode (reference "
                        "waymo_base.py:11-27): 600-iter coarse run, flat "
                        "fast_color_thres, no distortion loss — pair with "
                        "--program export_bbox / export_coarse to eyeball "
                        "cameras and coarse geometry")
    p.add_argument("--constant_baked", action="store_true",
                   help="compile the packed render tables into the render "
                        "executable as constants: 1.5-2.2x faster gathers "
                        "(exact), at a long per-scene first compile that the "
                        "persistent compilation cache amortizes — intended "
                        "for --render_video sessions")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.render_only:
        args.program = "render"  # run_FourierGrid.py:45 semantics

    from unboundednerfpytorch_tpu.configs.loader import load_config
    from unboundednerfpytorch_tpu.data.common import load_everything
    from unboundednerfpytorch_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    # executables persist across processes (the constant-baked render mode's
    # 250-600s per-scene compile is paid once, not per run)
    enable_persistent_compilation_cache()

    cfg = load_config(args.config, visualize_poses=args.visualize_poses)
    np.random.seed(args.seed)

    # multi-host rendezvous when launched as one process per host (no-op on
    # single-process runs)
    from unboundednerfpytorch_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed(log_fn=print)

    if args.program == "sfm":
        # custom-scene reconstruction (imgs2poses.py semantics): run COLMAP
        # on cfg.data.datadir's images/ and write poses_bounds.npy — BEFORE
        # load_everything, which needs the result. The reference ACCEPTS
        # this program but raises NotImplementedError
        # (run_FourierGrid.py:122-123); here it works when a colmap binary
        # is installed.
        from unboundednerfpytorch_tpu.data import colmap as colmap_mod

        colmap_mod.gen_poses(cfg.data.datadir)
        print(f"sfm: wrote {os.path.join(cfg.data.datadir, 'poses_bounds.npy')}")
        return 0

    data_dict = load_everything(cfg, sample_num=args.sample_num,
                                diffuse=args.diffuse)

    # block count (run_FourierGrid.py:101-103)
    block_num = 1
    if args.num_per_block > 0:
        block_num = max(1, len(data_dict["i_train"]) // args.num_per_block)

    exp_dir = os.path.join(cfg.basedir, cfg.expname)
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")

    if args.save_train_imgs and data_dict.get("images") is not None:
        # dump the (possibly resized/diffuse-swapped) training images
        # (load_waymo.py:338 save_training_imgs_to_disk)
        import imageio.v2 as imageio

        outdir = os.path.join(exp_dir, "train_imgs")
        os.makedirs(outdir, exist_ok=True)
        images = data_dict["images"]
        for i in np.asarray(data_dict["i_train"]):
            imageio.imwrite(
                os.path.join(outdir, f"{int(i):04d}.png"),
                (np.clip(np.asarray(images[int(i)]), 0, 1) * 255).astype(
                    np.uint8
                ),
            )
        print(f"saved {len(data_dict['i_train'])} training images to {outdir}")

    if args.program == "train":
        from unboundednerfpytorch_tpu.train import loop
        from unboundednerfpytorch_tpu.utils import checkpoint as ckpt

        if block_num > 1:
            if args.block_parallel:
                from unboundednerfpytorch_tpu.train import block_parallel

                block_parallel.run_train_blocks_parallel(
                    cfg, data_dict, block_num, exp_dir, seed=args.seed,
                    no_reload=args.no_reload, save_every=args.i_weights,
                )
            else:
                loop.run_train_blocks(
                    cfg, data_dict, block_num, exp_dir, seed=args.seed,
                    no_reload=args.no_reload, save_every=args.i_weights,
                )
            print(f"block training finished ({block_num} blocks)")
            return 0
        family, mcfg, params, psnr = loop.run_train(
            cfg, data_dict, seed=args.seed, exp_dir=exp_dir,
            no_reload=args.no_reload,
            no_reload_optimizer=args.no_reload_optimizer,
            save_every=args.i_weights,
            grid_parallel=args.grid_parallel,
            ft_path=args.ft_path,
        )
        ckpt.save_model(os.path.join(exp_dir, "fine_last"), family, mcfg, params)
        print(f"train finished: psnr {psnr:.2f}")
        args.program = "render"  # the reference always renders after training

    if args.program == "render":
        from unboundednerfpytorch_tpu.render import run_render

        run_render(args, cfg, data_dict, exp_dir)
        return 0
    if args.program == "export_bbox":
        from unboundednerfpytorch_tpu.train import bbox as bbox_mod
        from unboundednerfpytorch_tpu.train.loop import model_family_name

        xyz_min, xyz_max = bbox_mod.compute_bbox_by_cam_frustrm(
            cfg, data_dict, model_family_name(cfg)
        )
        out = args.export_bbox_and_cams_only or os.path.join(
            exp_dir, "cam.npz"
        )
        np.savez_compressed(
            out,
            xyz_min=np.asarray(xyz_min),
            xyz_max=np.asarray(xyz_max),
            poses=np.asarray(data_dict["poses"]),
        )
        print(f"exported bbox+cams to {out}")
        return 0
    if args.program == "export_coarse":
        from unboundednerfpytorch_tpu.render import export_coarse_geometry

        export_coarse_geometry(cfg, exp_dir,
                               out_path=args.export_coarse_only)
        return 0
    if args.program == "linemod_eval":
        from unboundednerfpytorch_tpu.utils import pose_eval

        seq = cfg.data.seq_name
        seq_dir = os.path.join(cfg.data.datadir, seq)
        model_pts = pose_eval.load_model_points(seq_dir)
        gts = np.asarray(data_dict["object_poses"])[np.asarray(data_dict["i_test"])]
        if args.pose_preds:
            preds = np.load(args.pose_preds)
        else:
            preds = gts  # sanity mode: GT-vs-GT must score 1.0 everywhere
        Ks = np.asarray(data_dict["Ks"])
        summary = pose_eval.evaluate_linemod_sequence(
            seq, model_pts, preds, gts, K=Ks[0]
        )
        out = os.path.join(exp_dir, "linemod_metrics.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps({"sequence": seq, **summary}))
        return 0
    if args.program == "gen_trace":
        # synthesize straight+rotation camera paths (run_gen_cam_paths.py)
        from unboundednerfpytorch_tpu.render import cam_paths

        out_dir = os.path.join(exp_dir, "cam_paths")
        paths = cam_paths.gen_cam_paths(
            cfg, data_dict, out_dir, write_video=args.dump_images
        )
        out = os.path.join(exp_dir, "render_poses.json")
        with open(out, "w") as f:
            json.dump(np.asarray(data_dict["render_poses"]).tolist(), f)
        print(
            f"wrote camera paths to {out_dir} "
            f"({len(paths['combined'])} combined views) and trace to {out}"
        )
        return 0
    if args.program == "export_baked":
        # servable artifact: bake the 2K+1 Fourier banks into ONE grid and
        # save it as a normal checkpoint — ship it without the training
        # state and render with `--program render --ft_path <exp>/baked_last`
        from unboundednerfpytorch_tpu.models import fourier_grid as fg
        from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

        path = os.path.join(exp_dir, "fine_last")
        family, mcfg, params, step, _ = ckpt_mod.load_model(path)
        if family != "FourierGrid" or mcfg.fourier_freq_num <= 0:
            raise SystemExit(
                "export_baked needs a trained FourierGrid model with "
                f"Fourier banks (got {family})"
            )
        pb, cb = fg.bake_for_rendering(params, mcfg, scale=args.bake_scale)
        out = os.path.join(exp_dir, "baked_last")
        ckpt_mod.save_model(out, family, cb, pb, global_step=step)
        print(
            f"export_baked: wrote single-bank servable checkpoint to {out} "
            f"(bake_scale {args.bake_scale}); render it with "
            f"--program render --ft_path {out}"
        )
        return 0
    if args.program == "tune_pose":
        # gradient-based camera-pose refinement against the trained model
        # (train/pose_tune.py). The reference ACCEPTS this program but
        # raises NotImplementedError (run_FourierGrid.py:122-123) even
        # though its scripts/sfm_FourierGrid.sh invokes it.
        from unboundednerfpytorch_tpu.train.pose_tune import run_tune_pose

        run_tune_pose(args, cfg, data_dict, exp_dir)
        return 0
    raise NotImplementedError(f"program {args.program} is not implemented")


if __name__ == "__main__":
    raise SystemExit(main())
