_base_ = './llff_default.py'

expname = 'dvgo_fortress'

data = dict(
    datadir='./data/nerf_llff_data/fortress',
    factor=4,
)
