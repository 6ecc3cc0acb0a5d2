_base_ = './lf_default.py'

expname = 'fouriergrid_lf_torch'
model = 'FourierGrid'

data = dict(datadir='./data/lf_data/torch')
