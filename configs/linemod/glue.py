_base_ = './linemod_default.py'

expname = 'fouriergrid_glue'

data = dict(
    datadir='./data/linemod',
    seq_name='glue',
    width_max=150,
    height_max=150,
)
