_base_ = './linemod_default.py'

expname = 'fouriergrid_phone'

data = dict(
    datadir='./data/linemod',
    seq_name='phone',
    width_max=190,
    height_max=190,
)
