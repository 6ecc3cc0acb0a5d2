_base_ = './llff_default.py'

expname = 'dvgo_leaves'

data = dict(
    datadir='./data/nerf_llff_data/leaves',
    factor=4,
)
