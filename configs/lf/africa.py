_base_ = './lf_default.py'

expname = 'fouriergrid_lf_africa'
model = 'FourierGrid'

data = dict(datadir='./data/lf_data/africa')
