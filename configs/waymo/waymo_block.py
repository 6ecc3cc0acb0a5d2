_base_ = './waymo_no_block.py'

expname = 'fouriergrid_waymo_block'

data = dict(
    sample_cam=73,
    test_rotate_angle=8,
    sample_interval=1,
    num_per_block=5,
)

fine_train = dict(
    N_iters=40000,
    pg_scale=[1000, 2000, 3000, 4000, 5000],
)
