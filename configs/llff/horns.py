_base_ = './llff_default.py'

expname = 'dvgo_horns'

data = dict(
    datadir='./data/nerf_llff_data/horns',
    factor=4,
)
