_base_ = './tankstemple_single_default.py'

expname = 'fouriergrid_barn'

data = dict(
    datadir='./data/TanksAndTemple/Barn',
)
