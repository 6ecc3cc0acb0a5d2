_base_ = '../waymo/waymo_base.py'

expname = 'fouriergrid_mega_quad'
basedir = './logs/mega'

data = dict(
    dataset_type='mega',
    datadir='./data/mega/quad',
)
