"""Benchmark-dataset fetcher + layout checker.

Downloads and lays out the reference's benchmark scenes so `tools/
parity_run.py --real` can reproduce the README PSNR table
(``/root/reference/README.md:17-27``: Mip-NeRF-360 avg 28.98, unbounded
Tanks&Temples avg 20.85) on a machine with network access. This build
environment has no egress — the script is the runbook, verified for URL/
layout correctness only.

Sources (the same ones the reference documents, README.md:159-187):
  * Mip-NeRF-360:        http://storage.googleapis.com/gresearch/refraw360/360_v2.zip
  * Unbounded T&T:       Google Drive file 11KRfN91W1AxAW6lOFs4EeYDbeoQZCi87
                         (tanks_and_temples.zip, via gdown)
  * NeRF-synthetic:      Google Drive file 18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG
                         (nerf_synthetic.zip, the canonical NeRF release)
  * Waymo Block-NeRF (processed): Google Drive folder
                         1Lcc6MF35EnXGyUy0UZPkUx7SfeLsv8u9 (19.1GB)

Usage:
  python tools/fetch_data.py --root data [--datasets nerf_synthetic 360_v2 tnt]
  python tools/fetch_data.py --root data --check   # verify layout only

Expected layout (what configs/*/.py `datadir` values point at):
  data/nerf_synthetic/lego/{transforms_train.json, train/, ...}
  data/360_v2/garden/{images/, images_4/, poses_bounds.npy or sparse/}
  data/tanks_and_temples/tat_training_Truck/{rgb/, pose/, intrinsics.txt}
  data/pytorch_waymo_dataset/{train/, val/, ...}
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import urllib.request
import zipfile

SOURCES = {
    "360_v2": {
        "kind": "http",
        "url": "http://storage.googleapis.com/gresearch/refraw360/360_v2.zip",
        "unzip_to": "360_v2",
        "probe": "360_v2/garden/images",
    },
    "nerf_synthetic": {
        "kind": "gdrive",
        "id": "18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG",
        "zip": "nerf_synthetic.zip",
        "unzip_to": ".",
        "probe": "nerf_synthetic/lego/transforms_train.json",
    },
    "tnt": {
        "kind": "gdrive",
        "id": "11KRfN91W1AxAW6lOFs4EeYDbeoQZCi87",
        "zip": "tanks_and_temples.zip",
        "unzip_to": ".",
        "probe": "tanks_and_temples/tat_training_Truck/rgb",
    },
    "waymo": {
        "kind": "gdrive_folder",
        "id": "1Lcc6MF35EnXGyUy0UZPkUx7SfeLsv8u9",
        "unzip_to": "pytorch_waymo_dataset",
        "probe": "pytorch_waymo_dataset/train",
    },
}


def _http_fetch(url: str, dst: str) -> None:
    print(f"downloading {url} -> {dst}")
    tmp = dst + ".part"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f, length=1 << 20)
    os.replace(tmp, dst)


def _gdown(file_id: str, dst: str, folder: bool = False) -> None:
    """Google Drive fetch via gdown (pip install gdown on the target box)."""
    args = [sys.executable, "-m", "gdown"]
    if folder:
        args += ["--folder", f"https://drive.google.com/drive/folders/{file_id}",
                 "-O", dst]
    else:
        args += ["--id", file_id, "-O", dst]
    print("running:", " ".join(args))
    subprocess.run(args, check=True)


def _unzip(zip_path: str, out_dir: str) -> None:
    print(f"unzipping {zip_path} -> {out_dir}")
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(out_dir)


def fetch(root: str, name: str) -> None:
    spec = SOURCES[name]
    os.makedirs(root, exist_ok=True)
    probe = os.path.join(root, spec["probe"])
    if os.path.exists(probe):
        print(f"{name}: already present ({probe})")
        return
    if spec["kind"] == "http":
        zip_path = os.path.join(root, os.path.basename(spec["url"]))
        if not os.path.exists(zip_path):
            _http_fetch(spec["url"], zip_path)
        _unzip(zip_path, os.path.join(root, spec["unzip_to"]))
    elif spec["kind"] == "gdrive":
        zip_path = os.path.join(root, spec["zip"])
        if not os.path.exists(zip_path):
            _gdown(spec["id"], zip_path)
        _unzip(zip_path, os.path.join(root, spec["unzip_to"]))
    elif spec["kind"] == "gdrive_folder":
        _gdown(spec["id"], os.path.join(root, spec["unzip_to"]), folder=True)
    if not os.path.exists(probe):
        raise SystemExit(
            f"{name}: fetched but expected path missing: {probe} — check the "
            "archive layout against the docstring"
        )
    print(f"{name}: ok ({probe})")


def check(root: str, names) -> int:
    missing = 0
    for name in names:
        probe = os.path.join(root, SOURCES[name]["probe"])
        ok = os.path.exists(probe)
        print(f"{name:15s} {'OK ' if ok else 'MISSING'} {probe}")
        missing += not ok
    return missing


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", default="data")
    ap.add_argument(
        "--datasets", nargs="*",
        default=["nerf_synthetic", "360_v2", "tnt"],
        choices=sorted(SOURCES),
    )
    ap.add_argument("--check", action="store_true",
                    help="verify layout only, no downloads")
    args = ap.parse_args(argv)
    if args.check:
        return 1 if check(args.root, args.datasets) else 0
    for name in args.datasets:
        fetch(args.root, name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
