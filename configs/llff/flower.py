_base_ = './llff_default.py'

expname = 'dvgo_flower'

data = dict(
    datadir='./data/nerf_llff_data/flower',
    factor=4,
)
