"""Visualize an exported coarse alpha/rgb volume (`--program export_coarse`
writes coarse_volume.npz).

TPU-repo equivalent of the reference's open3d viewer
(/root/reference/FourierGrid/tools/vis_volume.py): same inputs (volume npz +
threshold + optional cam.npz), but renders a headless matplotlib PNG
(active-voxel point cloud colored by rgb, scene bbox, camera frusta)
instead of an interactive open3d window — open3d is not in this image and
TPU hosts are headless.

Usage: python tools/vis_volume.py EXP_DIR/coarse_volume.npz 1e-3 \
           [--cam EXP_DIR/cam.npz] [--out volume.png] [--max_points 200000]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    ap.add_argument("path", help="coarse_volume.npz (alpha, rgb)")
    ap.add_argument("thres", type=float, help="alpha threshold")
    ap.add_argument("--cam", help="cam.npz from --program export_bbox")
    ap.add_argument("--out", default=None, help="output PNG path")
    ap.add_argument("--max_points", type=int, default=200_000)
    args = ap.parse_args()

    data = np.load(args.path)
    alpha, rgb = data["alpha"], data["rgb"]
    # export_coarse writes channel-last (alpha [X,Y,Z], rgb [X,Y,Z,3]);
    # tolerate a channel-first rgb from foreign exporters. alpha has no
    # channel axis, so it is never transposed.
    if rgb.ndim == 4 and rgb.shape[0] == 3 and rgb.shape[-1] != 3:
        rgb = np.transpose(rgb, (1, 2, 3, 0))
    print("Shape", alpha.shape, rgb.shape)
    active = alpha > args.thres
    print("Active rate", float(active.mean()))
    print("Active nums", int(active.sum()))

    xyz_min = np.zeros(3)
    xyz_max = np.asarray(alpha.shape, np.float64)
    poses = None
    if args.cam:
        cam = np.load(args.cam)
        xyz_min, xyz_max = cam["xyz_min"], cam["xyz_max"]
        poses = cam.get("poses")

    xyz = np.stack(active.nonzero(), -1)
    color = rgb[xyz[:, 0], xyz[:, 1], xyz[:, 2]][:, :3]
    if len(xyz) > args.max_points:
        sel = np.random.RandomState(0).choice(
            len(xyz), args.max_points, replace=False
        )
        xyz, color = xyz[sel], color[sel]
    pts = xyz / np.asarray(alpha.shape) * (xyz_max - xyz_min) + xyz_min

    from unboundednerfpytorch_tpu.utils.visualize import plot_volume

    out = args.out or os.path.splitext(args.path)[0] + ".png"
    plot_volume(pts, np.clip(color, 0, 1), xyz_min, xyz_max,
                poses=poses, out_path=out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
