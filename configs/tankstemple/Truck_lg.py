_base_ = './tankstemple_lg_default.py'

expname = 'dvgo_Truck_lg'

data = dict(
    datadir='./data/TanksAndTemple/Truck',
)
