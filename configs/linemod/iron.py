_base_ = './linemod_default.py'

expname = 'fouriergrid_iron'

data = dict(
    datadir='./data/linemod',
    seq_name='iron',
    width_max=240,
    height_max=240,
)
