#!/bin/bash
# Render trained checkpoints (reference: scripts/render_FourierGrid.sh).
# --constant_baked compiles the packed tables into the executable (exact,
# 1.5-2.2x gathers; one-time per-scene compile via the persistent cache) —
# intended for video renders.

# render testing sequences
python run_unbounded.py --program render --config configs/waymo/waymo_no_block.py --sample_num 100 --render_test
# render training sequences
python run_unbounded.py --program render --config configs/waymo/waymo_no_block.py --sample_num 5 --render_train
# video render with the constant-baked executable
python run_unbounded.py --program render --config configs/tankstemple_unbounded/Playground.py --render_video --constant_baked
