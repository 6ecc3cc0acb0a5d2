_base_ = './llff_default.py'

expname = 'dvgo_orchids'

data = dict(
    datadir='./data/nerf_llff_data/orchids',
    factor=4,
)
