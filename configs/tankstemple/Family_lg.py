_base_ = './tankstemple_lg_default.py'

expname = 'dvgo_Family_lg'

data = dict(
    datadir='./data/TanksAndTemple/Family',
)
