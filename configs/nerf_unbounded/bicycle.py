_base_ = './nerf_unbounded_default.py'

expname = 'dvgo_bicycle_unbounded'

data = dict(
    datadir='./data/360_v2/bicycle',
    factor=4,
)
