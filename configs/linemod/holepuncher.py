_base_ = './linemod_default.py'

expname = 'fouriergrid_holepuncher'

data = dict(
    datadir='./data/linemod',
    seq_name='holepuncher',
    width_max=120,
    height_max=120,
)
