_base_ = './building.py'

expname = 'fouriergrid_mega_building_no_block'

data = dict(
    num_per_block=-1,
)
