#!/bin/bash
# Download the benchmark datasets (reference: scripts/download_nerfstudio.sh
# plus the README dataset table). See tools/fetch_data.py for layout checks
# and per-dataset sources.
python tools/fetch_data.py --dataset nerf_synthetic
python tools/fetch_data.py --dataset 360_v2
python tools/fetch_data.py --dataset tnt
