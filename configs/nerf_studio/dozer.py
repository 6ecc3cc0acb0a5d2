_base_ = './nerf_studio_default.py'

expname = 'dvgo_ns_dozer'

data = dict(datadir='./data/nerfstudio/dozer')
