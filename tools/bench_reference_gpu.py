"""Reference-renderer GPU timer — pins the vs_baseline proxy (VERDICT r3 #5).

This repo's bench.py normalizes its render throughput against a 1.5e5
rays/s PROXY because the reference publishes no speed numbers and this
environment has no CUDA GPU. Run THIS script on the first machine that has
(a) a CUDA GPU, (b) the reference repo with its CUDA extensions built
(`cd FourierGrid/cuda && python setup.py install`, see its README): it
times the reference ``FourierGridModel`` forward over full 800x800 images
at the same shape bench.py uses (160^3 grids, 7 Fourier banks, rgbnet-12,
fast_color_thres 1e-4) and prints ONE JSON line whose value replaces
REFERENCE_RAYS_PER_S in bench.py.

  python tools/bench_reference_gpu.py --reference /path/to/UnboundedNeRFPytorch \
      [--ckpt fine_last.tar] [--hw 800]

Without --ckpt it times an untrained model with a density offset chosen to
produce a realistic trained-scene occupancy (the reference's compaction
means throughput depends on sparsity; a converged checkpoint is the
authoritative measurement — pass one when available).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True,
                    help="path to the sjtuytc/UnboundedNeRFPytorch checkout "
                         "(CUDA extensions built)")
    ap.add_argument("--ckpt", default="",
                    help="optional fine_last.tar from a converged run")
    ap.add_argument("--hw", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    sys.path.insert(0, args.reference)
    import numpy as np
    import torch

    assert torch.cuda.is_available(), (
        "this timer needs a CUDA GPU (that is its whole point — it pins the "
        "baseline this repo's TPU numbers are compared against)"
    )
    device = torch.device("cuda")

    from FourierGrid import utils  # noqa: F401  (registers CUDA ext paths)
    from FourierGrid.FourierGrid_model import FourierGridModel

    H = W = args.hw
    if args.ckpt:
        ckpt = torch.load(args.ckpt, map_location=device)
        model = FourierGridModel(**ckpt["model_kwargs"]).to(device)
        model.load_state_dict(ckpt["model_state_dict"])
    else:
        model = FourierGridModel(
            xyz_min=[-1.2] * 3, xyz_max=[1.2] * 3,
            num_voxels_density=160**3, num_voxels_rgb=160**3,
            num_voxels_base_density=160**3, num_voxels_base_rgb=160**3,
            alpha_init=1e-4, fast_color_thres=1e-4,
            contracted_norm="inf", fourier_freq_num=3,
            rgbnet_dim=12, rgbnet_depth=3, rgbnet_width=128,
        ).to(device)
        with torch.no_grad():
            # density offset -> ~half the march survives the threshold, a
            # trained-scene-like compaction ratio
            model.density.grid.add_(2.0)
    model.eval()

    focal = 1.2 * W
    K = torch.tensor(
        [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
        dtype=torch.float32, device=device,
    )
    render_kwargs = dict(
        near=0.2, far=1e9, bg=1.0, stepsize=0.5, inverse_y=False,
        flip_x=False, flip_y=False, render_depth=False,
    )

    from FourierGrid.FourierGrid_model import get_rays_of_a_view

    def render_once(theta: float) -> float:
        pos = 3.0 * np.array([np.cos(theta), np.sin(theta), 0.35])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0, 0, 1.0], -fwd)
        right /= np.linalg.norm(right)
        up = np.cross(-fwd, right)
        c2w = torch.tensor(
            np.stack([right, up, -fwd, pos], 1), dtype=torch.float32,
            device=device,
        )
        rays_o, rays_d, viewdirs = get_rays_of_a_view(
            H, W, K, c2w, ndc=False,
            inverse_y=render_kwargs["inverse_y"],
            flip_x=render_kwargs["flip_x"], flip_y=render_kwargs["flip_y"],
        )
        rays_o = rays_o.flatten(0, -2)
        rays_d = rays_d.flatten(0, -2)
        viewdirs = viewdirs.flatten(0, -2)
        torch.cuda.synchronize()
        t0 = time.perf_counter()
        with torch.no_grad():
            for i in range(0, rays_o.shape[0], args.chunk):
                model(
                    rays_o[i : i + args.chunk],
                    rays_d[i : i + args.chunk],
                    viewdirs[i : i + args.chunk],
                    global_step=1 << 30,
                    **{k: v for k, v in render_kwargs.items()
                       if k not in ("inverse_y", "flip_x", "flip_y",
                                    "render_depth")},
                )
        torch.cuda.synchronize()
        return time.perf_counter() - t0

    render_once(0.0)  # warmup (autotune, caches)
    best = min(render_once(0.3 + 0.07 * r) for r in range(args.reps))
    rays_per_s = H * W / best
    print(json.dumps({
        "metric": "reference_render_rays_per_s_per_gpu",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "detail": {
            "gpu": torch.cuda.get_device_name(0),
            "image": f"{H}x{W}",
            "seconds_per_image": round(best, 3),
            "ckpt": args.ckpt or "untrained(+2.0 density offset)",
            "replaces": "bench.py REFERENCE_RAYS_PER_S",
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
