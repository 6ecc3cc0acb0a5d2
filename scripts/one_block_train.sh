#!/bin/bash
# Train one Waymo block (reference: scripts/one_block_train.sh).
python run_unbounded.py --config configs/waymo/block_0_tt.py
