_base_ = './free_default.py'

expname = 'fouriergrid_free_lab'

data = dict(datadir='./data/free_dataset/lab')
