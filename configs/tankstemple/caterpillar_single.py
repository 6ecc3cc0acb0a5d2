_base_ = './tankstemple_single_default.py'

expname = 'fouriergrid_caterpillar'

data = dict(
    datadir='./data/TanksAndTemple/Caterpillar',
)
