_base_ = './tankstemple_single_default.py'

expname = 'fouriergrid_family'

data = dict(
    datadir='./data/TanksAndTemple/Family',
)
