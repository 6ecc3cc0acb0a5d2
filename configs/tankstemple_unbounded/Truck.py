_base_ = './tt_default.py'

expname = 'dvgo_Truck_unbounded'

data = dict(
    datadir='./data/tanks_and_temples/tat_training_Truck',
)
