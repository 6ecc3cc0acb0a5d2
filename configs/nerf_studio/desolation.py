_base_ = './nerf_studio_default.py'

expname = 'dvgo_ns_desolation'

data = dict(datadir='./data/nerfstudio/desolation')
