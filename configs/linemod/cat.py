_base_ = './linemod_default.py'

expname = 'fouriergrid_cat'

data = dict(
    datadir='./data/linemod',
    seq_name='cat',
    width_max=130,
    height_max=130,
)
