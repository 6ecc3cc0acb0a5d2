_base_ = './free_default.py'

expname = 'fouriergrid_free_stair'

data = dict(datadir='./data/free_dataset/stair')
