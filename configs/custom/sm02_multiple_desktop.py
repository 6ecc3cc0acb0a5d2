_base_ = './default_forward_facing.py'

expname = 'sm02_multiple_desktop'

data = dict(
    datadir='./data/sm02_multiple_desktop/dense',
    factor=2,
    movie_render_kwargs={
        'scale_r': 1.0,
        'scale_f': 0.8,
        'zrate': 2.0,
        'zdelta': 0.5,
    },
)
