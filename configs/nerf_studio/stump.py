_base_ = './Giannini_Hall.py'

expname = 'fouriergrid_nerfstudio_stump'
basedir = './logs/nerfstudio_stump'

data = dict(
    datadir='./data/nerfstudio_data/stump',
    bd_factor=None,
)

fine_train = dict(
    N_iters=10000,
)
