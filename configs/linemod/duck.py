_base_ = './linemod_default.py'

expname = 'fouriergrid_duck'

data = dict(
    datadir='./data/linemod',
    seq_name='duck',
    width_max=90,
    height_max=90,
)
