_base_ = './co3d_default.py'

expname = 'dvgo_co3d_teddybear'

data = dict(
    datadir='./data/co3d/teddybear/34_1479_4753',
    annot_path='./data/co3d/teddybear/frame_annotations.jgz',
    split_path='./data/co3d/teddybear/set_lists.json',
    sequence_name='34_1479_4753',
)
