_base_ = './nerf_unbounded_default.py'

expname = 'fouriergrid_garden'
model = 'FourierGrid'
basedir = './logs/360'

alpha_init = 1e-4
stepsize = 0.5

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=100000,
    N_rand=2048,
    lrate_decay=80,
    ray_sampler='flatten',
    weight_nearclip=1.0,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000],
    tv_before=20000,
    tv_dense_before=20000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
    weight_main=1.0,
)

data = dict(
    dataset_type='llff',
    datadir='./data/360_v2/garden',
    factor=8,
)

fine_model_and_render = dict(
    num_voxels_density=200**3,
    num_voxels_base_density=200**3,
    num_voxels_rgb=200**3,
    num_voxels_base_rgb=200**3,
    num_voxels_viewdir=-1,
    alpha_init=alpha_init,
    stepsize=stepsize,
    maskout_near_cam_vox=False,
    fast_color_thres={
        '_delete_': True,
        0: alpha_init * stepsize / 10,
        1500: min(alpha_init, 1e-4) * stepsize / 5,
        2500: min(alpha_init, 1e-4) * stepsize / 2,
        3500: min(alpha_init, 1e-4) * stepsize / 1.5,
        4500: min(alpha_init, 1e-4) * stepsize,
        5500: min(alpha_init, 1e-4),
        6500: 1e-4,
    },
    world_bound_scale=1,
)
