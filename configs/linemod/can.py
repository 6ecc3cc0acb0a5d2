_base_ = './linemod_default.py'

expname = 'fouriergrid_can'

data = dict(
    datadir='./data/linemod',
    seq_name='can',
    width_max=190,
    height_max=190,
)
