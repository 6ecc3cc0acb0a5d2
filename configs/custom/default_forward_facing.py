_base_ = '../default.py'

basedir = './logs/custom'

data = dict(
    dataset_type='llff',
    ndc=True,
    factor=4,
)

fine_model_and_render = dict(
    num_voxels_rgb=256**3,
    num_voxels_density=256**3,
    mpi_depth=128,
    rgbnet_dim=9,
    rgbnet_width=64,
    fast_color_thres=1e-3,
)
