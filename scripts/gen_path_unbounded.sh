#!/bin/bash
# Generate demo camera paths (reference: scripts/gen_path_FourierGrid.sh).
export CONFIG=configs/waymo/waymo_block.py
python run_unbounded.py --program gen_trace --config ${CONFIG}
