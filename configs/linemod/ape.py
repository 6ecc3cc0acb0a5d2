_base_ = './linemod_default.py'

expname = 'fouriergrid_ape'

data = dict(
    datadir='./data/linemod',
    seq_name='ape',
    seq_id=1,
    width_max=90,
    height_max=90,
)

fine_train = dict(N_iters=10000)
