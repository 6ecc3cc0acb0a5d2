"""CLI end-to-end: run the real `run_unbounded.py` driver surface (config
load → blender fixture load → two-stage train → checkpoint → auto-render →
export programs) against a generated on-disk dataset."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def blender_scene(tmp_path):
    """Tiny on-disk blender dataset rendered from the synthetic sphere."""
    import imageio.v2 as imageio

    from unboundednerfpytorch_tpu.data import synthetic

    H = W = 24
    images, poses, K = synthetic.sphere_scene_images(8, H, W)
    focal = K[0, 0]
    camera_angle_x = 2 * np.arctan(W / (2 * focal))
    splits = {"train": range(0, 6), "val": range(6, 7), "test": range(7, 8)}
    for split, idx in splits.items():
        frames = []
        for i in idx:
            name = f"r_{i}"
            rgba = np.concatenate(
                [images[i], np.ones_like(images[i][..., :1])], -1
            )
            imageio.imwrite(
                os.path.join(tmp_path, name + ".png"),
                (rgba * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": name, "transform_matrix": poses[i].tolist()}
            )
        with open(os.path.join(tmp_path, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x), "frames": frames}, f)
    return str(tmp_path)


@pytest.mark.slow
def test_cli_train_render_export(blender_scene, tmp_path):
    from unboundednerfpytorch_tpu.cli.main import main

    cfg_path = os.path.join(tmp_path, "scene.py")
    logs = os.path.join(tmp_path, "logs")
    with open(cfg_path, "w") as f:
        f.write(f"""
expname = 'cli_e2e'
basedir = {logs!r}

data = dict(
    datadir={blender_scene!r},
    dataset_type='blender',
    white_bkgd=True,
)

coarse_train = dict(N_iters=20, N_rand=128, pervoxel_lr=False)

fine_train = dict(
    N_iters=40, N_rand=128, pervoxel_lr=False, pg_scale=[],
    ray_sampler='flatten',
    skip_zero_grad_fields=['density', 'k0'],
)

coarse_model_and_render = dict(
    num_voxels_rgb=16**3, num_voxels_density=16**3,
    num_voxels_base_rgb=16**3, num_voxels_base_density=16**3,
    maskout_near_cam_vox=False,
)

fine_model_and_render = dict(
    num_voxels_rgb=20**3, num_voxels_density=20**3,
    num_voxels_base_rgb=20**3, num_voxels_base_density=20**3,
    rgbnet_dim=4, alpha_init=1e-2, maskout_near_cam_vox=False,
    sample_budget=16, budget_probe_stride=2, color_budget=8,
)
""")
    # train (auto-renders test split afterwards, reference behavior)
    rc = main(["--config", cfg_path, "--program", "train", "--dump_images"])
    assert rc == 0 or rc is None
    exp = os.path.join(logs, "cli_e2e")
    assert os.path.exists(os.path.join(exp, "fine_last", "meta.json"))
    assert os.path.exists(os.path.join(exp, "args.txt"))

    # export programs
    main(["--config", cfg_path, "--program", "export_bbox"])
    assert os.path.exists(os.path.join(exp, "cam.npz"))
    bbox = np.load(os.path.join(exp, "cam.npz"))
    assert np.all(bbox["xyz_max"] > bbox["xyz_min"])

    main(["--config", cfg_path, "--program", "export_coarse"])
    assert os.path.exists(os.path.join(exp, "coarse_volume.npz"))

    main(["--config", cfg_path, "--program", "gen_trace"])
    assert os.path.exists(os.path.join(exp, "render_poses.json"))

    # pose refinement against the trained checkpoint (the reference accepts
    # --program tune_pose but raises NotImplementedError)
    main(["--config", cfg_path, "--program", "tune_pose", "--tune_steps", "5"])
    tuned = np.load(os.path.join(exp, "tuned_poses.npy"))
    assert tuned.shape == (6, 3, 4) and np.all(np.isfinite(tuned))

    # explicit export output paths (run_export_{bbox,coarse}.py:14/19)
    alt_cam = os.path.join(str(tmp_path), "alt_cam.npz")
    main(["--config", cfg_path, "--program", "export_bbox",
          "--export_bbox_and_cams_only", alt_cam])
    assert os.path.exists(alt_cam)
    alt_vol = os.path.join(str(tmp_path), "alt_vol.npz")
    main(["--config", cfg_path, "--program", "export_coarse",
          "--export_coarse_only", alt_vol])
    assert os.path.exists(alt_vol)

    # --render_only alias + fast-preview factor + flipy/rot90 video post;
    # the video write falls back to a PNG frame dir without an ffmpeg backend
    main(["--config", cfg_path, "--render_only", "--render_video",
          "--render_video_factor", "2", "--render_video_flipy",
          "--render_video_rot90", "1"])
    assert (os.path.exists(os.path.join(exp, "render_video.mp4"))
            or os.listdir(os.path.join(exp, "render_video_frames")))

    # --auto_budget: occupancy-adaptive render budgets + hierarchical probe
    # (scene-statistics path through fg.suggest_budgets)
    main(["--config", cfg_path, "--render_only", "--render_test",
          "--auto_budget"])

    # --save_train_imgs dumps the training split to the exp folder
    main(["--config", cfg_path, "--program", "export_bbox",
          "--save_train_imgs"])
    assert len(os.listdir(os.path.join(exp, "train_imgs"))) == 6


@pytest.mark.slow
def test_cli_export_baked_and_render_ft_path(blender_scene, tmp_path):
    """train (FourierGrid) -> export_baked servable artifact -> render it
    via --ft_path (the serving flow; reference has no equivalent)."""
    from unboundednerfpytorch_tpu.cli.main import main

    cfg_path = os.path.join(tmp_path, "scene_fg.py")
    logs = os.path.join(tmp_path, "logs_fg")
    with open(cfg_path, "w") as f:
        f.write(f"""
expname = 'cli_fg'
basedir = {logs!r}
model = 'FourierGrid'

data = dict(
    datadir={blender_scene!r},
    dataset_type='blender',
    white_bkgd=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=30, N_rand=128, pervoxel_lr=False, pg_scale=[],
    skip_zero_grad_fields=['density', 'k0'],
)

fine_model_and_render = dict(
    num_voxels_rgb=16**3, num_voxels_density=16**3,
    num_voxels_base_rgb=16**3, num_voxels_base_density=16**3,
    rgbnet_dim=4, alpha_init=1e-2, fourier_freq_num=1,
    maskout_near_cam_vox=False,
)
""")
    rc = main(["--config", cfg_path, "--program", "train"])
    assert rc == 0 or rc is None
    exp = os.path.join(logs, "cli_fg")

    rc = main(["--config", cfg_path, "--program", "export_baked",
               "--bake_scale", "1.1"])
    assert rc == 0
    baked = os.path.join(exp, "baked_last")
    assert os.path.exists(os.path.join(baked, "meta.json"))
    with open(os.path.join(baked, "meta.json")) as f:
        meta = json.load(f)
    assert meta["model_kwargs"]["fourier_freq_num"] == 0  # single bank

    rc = main(["--config", cfg_path, "--program", "render",
               "--ft_path", baked, "--dump_images"])
    assert rc == 0 or rc is None

    # --ft_path into training: fine-tune from an explicit checkpoint
    # (run_FourierGrid.py --ft_path semantics; wins over the implicit
    # stage-last resume). Reload at step 30 >= N_iters -> trains 0 extra
    # steps but must load and re-save cleanly.
    fine = os.path.join(exp, "fine_last")
    rc = main(["--config", cfg_path, "--program", "train",
               "--ft_path", fine])
    assert rc == 0 or rc is None
