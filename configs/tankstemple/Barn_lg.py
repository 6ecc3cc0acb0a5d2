_base_ = './tankstemple_lg_default.py'

expname = 'dvgo_Barn_lg'

data = dict(
    datadir='./data/TanksAndTemple/Barn',
)
