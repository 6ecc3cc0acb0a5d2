_base_ = './linemod_default.py'

expname = 'fouriergrid_eggbox'

data = dict(
    datadir='./data/linemod',
    seq_name='eggbox',
    width_max=140,
    height_max=140,
)
