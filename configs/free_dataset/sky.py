_base_ = './free_default.py'

expname = 'fouriergrid_free_sky'

data = dict(datadir='./data/free_dataset/sky')
