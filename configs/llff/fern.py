_base_ = './llff_default.py'

expname = 'dvgo_fern'

data = dict(
    datadir='./data/nerf_llff_data/fern',
    factor=4,
)
