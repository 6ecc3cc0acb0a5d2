_base_ = './nerf_unbounded_default.py'

expname = 'dvgo_counter_unbounded'

data = dict(
    datadir='./data/360_v2/counter',
    factor=2,
)
