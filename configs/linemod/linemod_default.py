_base_ = '../default.py'

basedir = './logs/linemod'

data = dict(
    dataset_type='linemod',
    white_bkgd=True,
    load2gpu_on_the_fly=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=20000,
)
