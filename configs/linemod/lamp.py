_base_ = './linemod_default.py'

expname = 'fouriergrid_lamp'

data = dict(
    datadir='./data/linemod',
    seq_name='lamp',
    width_max=260,
    height_max=260,
)
