#!/bin/bash
# Structure-from-motion on a custom scene (reference: scripts/sfm_FourierGrid.sh).
# Runs the COLMAP driver (data/colmap.py) and writes poses_bounds.npy.
export CONFIG=configs/waymo/waymo_no_block.py
python run_unbounded.py --program sfm --config ${CONFIG} --sample_num 100
