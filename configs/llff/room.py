_base_ = './llff_default.py'

expname = 'dvgo_room'

data = dict(
    datadir='./data/nerf_llff_data/room',
    factor=4,
)
