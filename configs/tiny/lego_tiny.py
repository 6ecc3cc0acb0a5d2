_base_ = '../default.py'

# BASELINE.json configs[0]: CPU-runnable tiny dvgo sanity config —
# 96^3 voxels at 100x100 rays.
expname = 'dvgo_lego_tiny'
basedir = './logs/tiny'

data = dict(
    datadir='./data/nerf_synthetic/lego',
    dataset_type='blender',
    white_bkgd=True,
    half_res=True,
)

coarse_train = dict(N_iters=500, N_rand=1024)

fine_train = dict(
    N_iters=2000,
    N_rand=1024,
    pg_scale=[1000],
)

coarse_model_and_render = dict(
    num_voxels_rgb=96**3,
    num_voxels_density=96**3,
    num_voxels_base_rgb=96**3,
    num_voxels_base_density=96**3,
)

fine_model_and_render = dict(
    num_voxels_rgb=96**3,
    num_voxels_density=96**3,
    num_voxels_base_rgb=96**3,
    num_voxels_base_density=96**3,
)
