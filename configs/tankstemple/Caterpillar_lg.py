_base_ = './tankstemple_lg_default.py'

expname = 'dvgo_Caterpillar_lg'

data = dict(
    datadir='./data/TanksAndTemple/Caterpillar',
)
