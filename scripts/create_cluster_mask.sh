#!/bin/bash
# Mega-NeRF cluster-mask creation wrapper. Counterpart of the reference's
# scripts/create_cluster_mask.sh, which drives `create_cluster_masks.py`
# from the EXTERNAL mega-nerf repo (github.com/cmusatyalab/mega-nerf) —
# that script is not part of the reference tree either; clone mega-nerf
# next to this repo first. The torchrun data-parallel launch is preserved
# (mask creation is a torch preprocessing job, not a TPU workload; the
# resulting masks feed data/mega.py like any other mega dataset).
export DATASET_NAME=${DATASET_NAME:-building}
export MASK_PATH=data/mega/${DATASET_NAME}/pixsfm-grid-8      # output folder
export DATASET_PATH=./data/mega/${DATASET_NAME}/${DATASET_NAME}-pixsfm
export NUM_GPUS=${NUM_GPUS:-4}
export MEGA_NERF=${MEGA_NERF:-../mega-nerf}

python -m torch.distributed.run --standalone --nnodes=1 \
    --nproc_per_node ${NUM_GPUS} --max_restarts 0 \
    ${MEGA_NERF}/create_cluster_masks.py \
    --config ${MEGA_NERF}/mega_nerf/configs/${DATASET_NAME}.yaml \
    --dataset_path ${DATASET_PATH} --output ${MASK_PATH} --grid_dim 2 4
