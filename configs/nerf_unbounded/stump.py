_base_ = './nerf_unbounded_default.py'

expname = 'dvgo_stump_unbounded'

data = dict(
    datadir='./data/360_v2/stump',
    factor=4,
)
