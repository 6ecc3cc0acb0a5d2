_base_ = './linemod_default.py'

expname = 'fouriergrid_benchvise'

data = dict(
    datadir='./data/linemod',
    seq_name='benchvise',
    width_max=230,
    height_max=230,
)
