_base_ = './nerf_studio_default.py'

expname = 'dvgo_ns_poster'

data = dict(datadir='./data/nerfstudio/poster')
