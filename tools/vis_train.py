"""Visualize exported cameras + scene bbox (`--program export_bbox` writes
cam.npz).

TPU-repo equivalent of the reference's open3d camera viewer
(/root/reference/FourierGrid/tools/vis_train.py): renders camera frusta and
the scene bbox to a headless matplotlib PNG.

Usage: python tools/vis_train.py EXP_DIR/cam.npz [--out cams.png]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="cam.npz (xyz_min, xyz_max, poses)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    data = np.load(args.path)
    poses = data["poses"]
    xyz_min, xyz_max = data["xyz_min"], data["xyz_max"]
    print(f"{len(poses)} cameras; bbox {xyz_min} .. {xyz_max}")

    from unboundednerfpytorch_tpu.utils.visualize import plot_cameras

    out = args.out or os.path.splitext(args.path)[0] + ".png"
    plot_cameras(poses, out, xyz_min=xyz_min, xyz_max=xyz_max)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
