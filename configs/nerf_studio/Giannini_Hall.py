_base_ = './nerf_studio_default.py'

model = 'FourierGrid'
expname = 'fouriergrid_giannini_hall'
basedir = './logs/Giannini-Hall'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    datadir='./data/nerfstudio_data/Giannini-Hall',
    factor=8,
    llffhold=-1,
    dvgohold=8,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
    load2gpu_on_the_fly=True,
    movie_render_kwargs=dict(
        shift_x=0.0,
        shift_y=-0.3,
        shift_z=0,
        scale_r=0.2,
        pitch_deg=-40,
    ),
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=100000,
    N_rand=2048,
    weight_distortion=0.02,
    pervoxel_lr=False,
)

fine_model_and_render = dict(
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
    maskout_near_cam_vox=False,
)
