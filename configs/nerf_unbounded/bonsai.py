_base_ = './nerf_unbounded_default.py'

expname = 'dvgo_bonsai_unbounded'

data = dict(
    datadir='./data/360_v2/bonsai',
    factor=2,
)
