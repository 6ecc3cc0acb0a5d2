_base_ = '../default.py'

expname = 'fouriergrid_train'
model = 'FourierGrid'
basedir = './logs/tanks_and_temple_unbounded'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    dataset_type='nerfpp',
    inverse_y=True,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
    datadir='./data/tanks_and_temples/tat_training_Train',
    unbounded_inner_r=1.0,
    ndc=False,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=30000,
    N_rand=4096,
    ray_sampler='flatten',
    weight_distortion=0.01,
    pg_scale=[1000, 2000, 3000, 4000, 5000, 6000, 7000],
    tv_before=1e9,
    tv_dense_before=10000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
    pervoxel_lr=False,
    lrate_decay=20,
    weight_entropy_last=1e-3,
    weight_rgbper=1e-2,
)

fine_model_and_render = dict(
    num_voxels_density=200**3,
    num_voxels_base_density=200**3,
    num_voxels_rgb=200**3,
    num_voxels_base_rgb=200**3,
    num_voxels_viewdir=-1,
    alpha_init=alpha_init,
    stepsize=stepsize,
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
    rgbnet_dim=12,
    fourier_freq_num=4,
    rgbnet_depth=3,
    maskout_near_cam_vox=False,
    # TPU render fast path (tt_default.py): two-stage packed engine with a
    # density bake at render time (color exact)
    grid_dtype='bfloat16',
    sample_budget=96,
    budget_probe_stride=2,
    color_budget=32,
    density_bake_scale=2.0,
)
