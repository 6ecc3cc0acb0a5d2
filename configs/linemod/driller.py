_base_ = './linemod_default.py'

expname = 'fouriergrid_driller'

data = dict(
    datadir='./data/linemod',
    seq_name='driller',
    width_max=250,
    height_max=250,
)
