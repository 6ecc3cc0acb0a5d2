_base_ = '../default.py'

basedir = './logs/nerf_studio'

data = dict(
    dataset_type='nerfstudio',
    factor=4,
    dvgohold=8,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=40000,
    N_rand=4096,
    lrate_decay=80,
    ray_sampler='flatten',
    weight_nearclip=1.0,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000],
    tv_before=20000,
    tv_dense_before=20000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
)
