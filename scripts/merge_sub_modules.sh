#!/bin/bash
# Mega-NeRF submodule-merge wrapper. Counterpart of the reference's
# scripts/merge_sub_modules.sh, which drives `merge_submodules.py` from the
# EXTERNAL mega-nerf repo (github.com/cmusatyalab/mega-nerf) — not part of
# the reference tree either. For THIS framework's own per-block checkpoints
# (fine_last_{i} from --num_per_block / --block_parallel training) use the
# native device-side min-merge instead:
#   python run_unbounded.py --config <cfg> --program render   # auto-merges
export DATASET_NAME=${DATASET_NAME:-building}
export EXP_FOLDER=data/mega/${DATASET_NAME}/train_exp_logs/
export MERGED_OUTPUT=./data/mega/${DATASET_NAME}/${DATASET_NAME}-pixsfm-8.pt
export MASK_PATH=data/mega/${DATASET_NAME}/building-pixsfm-grid-8
export MEGA_NERF=${MEGA_NERF:-../mega-nerf}

python ${MEGA_NERF}/merge_submodules.py \
    --config_file ${MEGA_NERF}/mega_nerf/configs/${DATASET_NAME}.yaml \
    --ckpt_prefix ${EXP_FOLDER}/ --centroid_path ${MASK_PATH}/params.pt \
    --output ${MERGED_OUTPUT}
