_base_ = './free_default.py'

expname = 'fouriergrid_free_hydrant'

data = dict(datadir='./data/free_dataset/hydrant')
