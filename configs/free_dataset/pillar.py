_base_ = './free_default.py'

expname = 'fouriergrid_free_pillar'

data = dict(datadir='./data/free_dataset/pillar')
