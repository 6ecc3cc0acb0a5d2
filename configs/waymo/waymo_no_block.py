_base_ = './waymo_base.py'

model = 'FourierGrid'
expname = 'fouriergrid_waymo_no_block'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    datadir='./data/waymo_ordered_dataset',
    factor=2,
    near_clip=0.1,
    near=0.1,
    far=0.01,
    rand_bkgd=True,
    test_rotate_angle=360,
    sample_interval=1,
    num_per_block=-1,
    unbounded_inner_r=0.8,
    training_ids=['73_%d' % i for i in range(50)],
)

fine_train = dict(
    N_iters=3000,
    N_rand=2048,
    pg_scale=[3000, 4000, 5000, 6000, 7000],
    pervoxel_lr=False,
    lrate_decay=20,
    weight_entropy_last=1e-3,
    weight_rgbper=1e-2,
    weight_nearclip=0,
    weight_main=3.0,
    weight_freq=1.0,
    weight_distortion=-1,
)

fine_model_and_render = dict(
    num_voxels_density=300**3,
    num_voxels_base_density=300**3,
    num_voxels_rgb=300**3,
    num_voxels_base_rgb=300**3,
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
    contracted_norm='l2',
    rgbnet_dim=3,
    bg_len=0.2,
    viewbase_pe=2,
    maskout_near_cam_vox=False,
)

# diffusion-image replacement table for --diffuse
# (reference waymo_no_block.py:119-122)
diffusion = dict(
    diff_root='diffusion',
    diff_replace={'69_0': 'airplane'},
)
