#!/bin/bash
# Train + evaluate the flagship FourierGrid model on the headline benchmark
# scenes (reference: scripts/train_FourierGrid.sh). One TPU host trains DP
# over all visible chips automatically (train/loop.py builds the `data`
# mesh); add --grid_parallel N for >HBM grids.

# Unbounded Tanks and Temples
python run_unbounded.py --program train --config configs/tankstemple_unbounded/playground_single.py --render_train --render_test --render_video
python run_unbounded.py --program train --config configs/tankstemple_unbounded/train_single.py --render_train --render_test --render_video
python run_unbounded.py --program train --config configs/tankstemple_unbounded/truck_single.py --render_train --render_test --render_video
python run_unbounded.py --program train --config configs/tankstemple_unbounded/m60_single.py --render_train --render_test --render_video --eval_lpips

# Mip-NeRF-360
for scene in room stump bicycle bonsai garden kitchen counter; do
  python run_unbounded.py --program train --config configs/nerf_unbounded/${scene}_single.py --render_train --render_test --render_video --eval_lpips
done

# Bounded scenes
python run_unbounded.py --program train --config configs/tankstemple/Family_lg.py --render_train --render_test --render_video
python run_unbounded.py --program train --config configs/llff/leaves.py --render_train --render_test --render_video
