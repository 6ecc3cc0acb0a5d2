_base_ = './linemod_default.py'

expname = 'fouriergrid_camera'

data = dict(
    datadir='./data/linemod',
    seq_name='camera',
    width_max=150,
    height_max=150,
)
