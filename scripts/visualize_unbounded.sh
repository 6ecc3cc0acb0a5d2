#!/bin/bash
# Camera + coarse-geometry visualization pipeline. Counterpart of the
# reference's scripts/visualize_FourierGrid.sh (export_bbox/export_coarse
# programs + the vis_train/vis_volume viewers; visualize_cameras for the
# Waymo block layout). The viewers render headlessly to PNG when no
# display/open3d is available.
export CONFIG=${CONFIG:-configs/waymo/waymo_base.py}

# visualize cameras (npz of cam poses + scene bbox)
python run_unbounded.py --program export_bbox --config ${CONFIG} \
    --export_bbox_and_cams_only data/vis/cam.npz --sample_num 100
# visualize coarse geometry (alpha/rgb volume npz)
python run_unbounded.py --program export_coarse --config ${CONFIG} \
    --export_coarse_only data/vis/cam_coarse.npz --sample_num 100

# viewers (PNG fallback without a desktop)
python tools/vis_train.py data/vis/cam.npz
python tools/vis_volume.py data/vis/cam_coarse.npz 0.001 --cam data/vis/cam.npz
# Waymo camera/block layout figures (data/preprocess.py output dirs)
python -m unboundednerfpytorch_tpu.utils.visualize --data_path data/samples/block_0
