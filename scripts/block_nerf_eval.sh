#!/bin/bash
# Block-NeRF composed inference (reference: scripts/block_nerf_eval.sh):
# visibility-gated block filtering + inverse-distance-weighted merge.
python eval_block_nerf_tpu.py --root_dir data/pytorch_waymo_dataset --chunk 8192
