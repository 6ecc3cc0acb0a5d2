_base_ = './nerf_unbounded_default.py'

expname = 'dvgo_garden_unbounded'

data = dict(
    datadir='./data/360_v2/garden',
    factor=4,
)
