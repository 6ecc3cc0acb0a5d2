_base_ = '../default.py'

basedir = './logs/co3d'

data = dict(
    dataset_type='co3d',
    inverse_y=True,
    flip_x=True,
    flip_y=True,
    white_bkgd=True,
)
