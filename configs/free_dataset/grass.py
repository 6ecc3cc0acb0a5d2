_base_ = './free_default.py'

expname = 'fouriergrid_free_grass'

data = dict(datadir='./data/free_dataset/grass')
