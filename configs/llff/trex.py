_base_ = './llff_default.py'

expname = 'dvgo_trex'

data = dict(
    datadir='./data/nerf_llff_data/trex',
    factor=4,
)
