#!/bin/bash
# Block-NeRF per-block training (reference: scripts/block_nerf_train.sh).
# Usage: bash scripts/block_nerf_train.sh block_0
# DP over all visible chips via --data_parallel 0 (auto).
python train_block_nerf_tpu.py --root_dir data/pytorch_waymo_dataset --block_index $1
