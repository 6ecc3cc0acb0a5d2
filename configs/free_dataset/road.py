_base_ = './free_default.py'

expname = 'fouriergrid_free_road'

data = dict(datadir='./data/free_dataset/road')
