_base_ = './tankstemple_lg_default.py'

expname = 'dvgo_Ignatius_lg'

data = dict(
    datadir='./data/TanksAndTemple/Ignatius',
)
