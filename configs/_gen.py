"""Generate per-scene config files for the standard dataset families.
Run: python configs/_gen.py  (idempotent; files are plain python configs)."""
import os

HERE = os.path.dirname(os.path.abspath(__file__))

BLENDER = ["chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship"]
LLFF = ["fern", "flower", "fortress", "horns", "leaves", "orchids", "room", "trex"]
UNBOUNDED = ["bicycle", "bonsai", "counter", "garden", "kitchen", "room", "stump"]
TT_UNBOUNDED = ["Truck", "M60", "Playground", "Train"]
LF = ["africa", "basket", "ship", "statue", "torch"]
MEGA = ["building", "rubble", "quad"]

def write(path, text):
    full = os.path.join(HERE, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(text)

for s in BLENDER:
    write(f"nerf/{s}.py", f"""_base_ = '../default.py'

expname = 'dvgo_{s}'
basedir = './logs/nerf_synthetic'

data = dict(
    datadir='./data/nerf_synthetic/{s}',
    dataset_type='blender',
    white_bkgd=True,
)
""")

write("llff/llff_default.py", """_base_ = '../default.py'

basedir = './logs/llff'

data = dict(
    dataset_type='llff',
    ndc=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=30000,
    N_rand=4096,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000],
    ray_sampler='flatten',
    tv_before=1e9,
    tv_dense_before=10000,
    weight_tv_density=1e-5,
    weight_tv_k0=1e-6,
)

fine_model_and_render = dict(
    num_voxels_rgb=256**3,
    num_voxels_density=256**3,
    mpi_depth=128,
    rgbnet_dim=9,
    rgbnet_width=64,
    world_bound_scale=1,
    fast_color_thres=1e-3,
)
""")
for s in LLFF:
    write(f"llff/{s}.py", f"""_base_ = './llff_default.py'

expname = 'dvgo_{s}'

data = dict(
    datadir='./data/nerf_llff_data/{s}',
    factor=4,
)
""")

write("nerf_unbounded/nerf_unbounded_default.py", """_base_ = '../default.py'

basedir = './logs/nerf_unbounded'

data = dict(
    dataset_type='llff',
    spherify=True,
    factor=4,
    llffhold=8,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=40000,
    N_rand=4096,
    lrate_decay=80,
    ray_sampler='flatten',
    weight_nearclip=1.0,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000],
    tv_before=20000,
    tv_dense_before=20000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
)

alpha_init = 1e-4
stepsize = 0.5

fine_model_and_render = dict(
    num_voxels_rgb=320**3,
    num_voxels_density=320**3,
    num_voxels_base_rgb=320**3,
    num_voxels_base_density=320**3,
    alpha_init=alpha_init,
    stepsize=stepsize,
    fast_color_thres={
        '_delete_': True,
        0: alpha_init * stepsize / 10,
        1500: min(alpha_init, 1e-4) * stepsize / 5,
        2500: min(alpha_init, 1e-4) * stepsize / 2,
        3500: min(alpha_init, 1e-4) * stepsize / 1.5,
        4500: min(alpha_init, 1e-4) * stepsize,
        5500: min(alpha_init, 1e-4),
        6500: 1e-4,
    },
    world_bound_scale=1,
)
""")
for s in UNBOUNDED:
    write(f"nerf_unbounded/{s}_single.py", f"""_base_ = './nerf_unbounded_default.py'

expname = 'fouriergrid_{s}'
model = 'FourierGrid'
basedir = './logs/360'

alpha_init = 1e-4
stepsize = 0.5

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=100000,
    N_rand=2048,
    lrate_decay=80,
    ray_sampler='flatten',
    weight_nearclip=1.0,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000],
    tv_before=20000,
    tv_dense_before=20000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
    weight_main=1.0,
)

data = dict(
    dataset_type='llff',
    datadir='./data/360_v2/{s}',
    factor=8,
)

fine_model_and_render = dict(
    num_voxels_density=200**3,
    num_voxels_base_density=200**3,
    num_voxels_rgb=200**3,
    num_voxels_base_rgb=200**3,
    num_voxels_viewdir=-1,
    alpha_init=alpha_init,
    stepsize=stepsize,
    maskout_near_cam_vox=False,
    fast_color_thres={{
        '_delete_': True,
        0: alpha_init * stepsize / 10,
        1500: min(alpha_init, 1e-4) * stepsize / 5,
        2500: min(alpha_init, 1e-4) * stepsize / 2,
        3500: min(alpha_init, 1e-4) * stepsize / 1.5,
        4500: min(alpha_init, 1e-4) * stepsize,
        5500: min(alpha_init, 1e-4),
        6500: 1e-4,
    }},
    world_bound_scale=1,
)
""")

for s in TT_UNBOUNDED:
    write(f"tankstemple_unbounded/{s.lower()}_single.py", f"""_base_ = '../default.py'

expname = 'fouriergrid_{s.lower()}'
model = 'FourierGrid'
basedir = './logs/tanks_and_temple_unbounded'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    dataset_type='nerfpp',
    inverse_y=True,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
    datadir='./data/tanks_and_temples/tat_training_{s}',
    unbounded_inner_r=1.0,
    ndc=False,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=30000,
    N_rand=4096,
    ray_sampler='flatten',
    weight_distortion=0.01,
    pg_scale=[1000, 2000, 3000, 4000, 5000, 6000, 7000],
    tv_before=1e9,
    tv_dense_before=10000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
    pervoxel_lr=False,
    lrate_decay=20,
    weight_entropy_last=1e-3,
    weight_rgbper=1e-2,
)

fine_model_and_render = dict(
    num_voxels_density=200**3,
    num_voxels_base_density=200**3,
    num_voxels_rgb=200**3,
    num_voxels_base_rgb=200**3,
    num_voxels_viewdir=-1,
    alpha_init=alpha_init,
    stepsize=stepsize,
    fast_color_thres={{
        '_delete_': True,
        0: alpha_init * stepsize / 10,
        1500: min(alpha_init, 1e-4) * stepsize / 5,
        2500: min(alpha_init, 1e-4) * stepsize / 2,
        3500: min(alpha_init, 1e-4) * stepsize / 1.5,
        4500: min(alpha_init, 1e-4) * stepsize,
        5500: min(alpha_init, 1e-4),
        6500: 1e-4,
    }},
    world_bound_scale=1,
    rgbnet_dim=12,
    fourier_freq_num=4,
    rgbnet_depth=3,
    maskout_near_cam_vox=False,
)
""")

write("waymo/waymo_base.py", """_base_ = '../default.py'

model = 'FourierGrid'
basedir = './logs/waymo'

alpha_init = 1e-2
stepsize = 0.5

data = dict(
    dataset_type='waymo',
    inverse_y=True,
    white_bkgd=True,
    rand_bkgd=False,
    unbounded_inward=True,
)

coarse_train = dict(N_iters=0, ray_sampler='flatten')

fine_train = dict(
    N_iters=30000,
    N_rand=4096,
    ray_sampler='flatten',
    weight_distortion=0.01,
    pg_scale=[1000, 2000, 3000, 4000, 5000, 6000, 7000],
    tv_before=1e9,
    tv_dense_before=10000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
)

fine_model_and_render = dict(
    alpha_init=alpha_init,
    stepsize=stepsize,
    fast_color_thres={
        '_delete_': True,
        0: alpha_init * stepsize / 10,
        1500: min(alpha_init, 1e-4) * stepsize / 5,
        2500: min(alpha_init, 1e-4) * stepsize / 2,
        3500: min(alpha_init, 1e-4) * stepsize / 1.5,
        4500: min(alpha_init, 1e-4) * stepsize,
        5500: min(alpha_init, 1e-4),
        6500: 1e-4,
    },
    world_bound_scale=1,
    contracted_norm='l2',
    rgbnet_dim=12,
    bg_len=0.2,
    viewbase_pe=8,
    t_boundary=1.5,
)
""")

for s in MEGA:
    write(f"mega/{s}.py", f"""_base_ = '../waymo/waymo_base.py'

expname = 'fouriergrid_mega_{s}'
basedir = './logs/mega'

data = dict(
    dataset_type='mega',
    datadir='./data/mega/{s}',
)
""")

write("lf/lf_default.py", """_base_ = '../default.py'

basedir = './logs/lf'

data = dict(
    dataset_type='nerfpp',
    inverse_y=True,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=30000,
    N_rand=4096,
    ray_sampler='flatten',
    weight_distortion=0.01,
    pg_scale=[1000, 2000, 3000, 4000, 5000, 6000, 7000],
    tv_before=1e9,
    tv_dense_before=10000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
)

alpha_init = 1e-4
stepsize = 0.5

fine_model_and_render = dict(
    num_voxels_rgb=320**3,
    num_voxels_density=320**3,
    num_voxels_base_rgb=320**3,
    num_voxels_base_density=320**3,
    alpha_init=alpha_init,
    stepsize=stepsize,
    fast_color_thres={
        '_delete_': True,
        0: alpha_init * stepsize / 10,
        1500: min(alpha_init, 1e-4) * stepsize / 5,
        2500: min(alpha_init, 1e-4) * stepsize / 2,
        3500: min(alpha_init, 1e-4) * stepsize / 1.5,
        4500: min(alpha_init, 1e-4) * stepsize,
        5500: min(alpha_init, 1e-4),
        6500: 1e-4,
    },
    world_bound_scale=1,
)
""")
for s in LF:
    write(f"lf/{s}.py", f"""_base_ = './lf_default.py'

expname = 'fouriergrid_lf_{s}'
model = 'FourierGrid'

data = dict(datadir='./data/lf_data/{s}')
""")

write("tiny/lego_tiny.py", """_base_ = '../default.py'

# BASELINE.json configs[0]: CPU-runnable tiny dvgo sanity config —
# 96^3 voxels at 100x100 rays.
expname = 'dvgo_lego_tiny'
basedir = './logs/tiny'

data = dict(
    datadir='./data/nerf_synthetic/lego',
    dataset_type='blender',
    white_bkgd=True,
    half_res=True,
)

coarse_train = dict(N_iters=500, N_rand=1024)

fine_train = dict(
    N_iters=2000,
    N_rand=1024,
    pg_scale=[1000],
)

coarse_model_and_render = dict(
    num_voxels_rgb=96**3,
    num_voxels_density=96**3,
    num_voxels_base_rgb=96**3,
    num_voxels_base_density=96**3,
)

fine_model_and_render = dict(
    num_voxels_rgb=96**3,
    num_voxels_density=96**3,
    num_voxels_base_rgb=96**3,
    num_voxels_base_density=96**3,
)
""")


# nsvf / blendedmvs / deepvoxels / tankstemple(bounded) / co3d / free / nerf_studio / custom
NSVF = ["Bike", "Lifestyle", "Palace", "Robot", "Spaceship", "Steamtrain", "Toad", "Wineholder"]
for s in NSVF:
    write(f"nsvf/{s}.py", f"""_base_ = '../default.py'

expname = 'dvgo_{s}'
basedir = './logs/nsvf_synthetic'

data = dict(
    datadir='./data/Synthetic_NSVF/{s}',
    dataset_type='nsvf',
    inverse_y=True,
    white_bkgd=True,
)
""")

BMVS = ["Character", "Fountain", "Jade", "Statues"]
for s in BMVS:
    write(f"blendedmvs/{s}.py", f"""_base_ = '../default.py'

expname = 'dvgo_{s}'
basedir = './logs/blended_mvs'

data = dict(
    datadir='./data/BlendedMVS/{s}',
    dataset_type='blendedmvs',
    inverse_y=True,
    white_bkgd=True,
)
""")

DV = ["armchair", "cube", "greek", "vase"]
for s in DV:
    write(f"deepvoxels/{s}.py", f"""_base_ = '../default.py'

expname = 'dvgo_{s}'
basedir = './logs/deepvoxels'

data = dict(
    datadir='./data/deepvoxels',
    dataset_type='deepvoxels',
    sequence_name='{s}',
    white_bkgd=True,
)
""")

TT = ["Barn", "Caterpillar", "Family", "Ignatius", "Truck"]
for s in TT:
    write(f"tankstemple/{s}.py", f"""_base_ = '../default.py'

expname = 'dvgo_{s}'
basedir = './logs/tanks_and_temples'

data = dict(
    datadir='./data/TanksAndTemple/{s}',
    dataset_type='tankstemple',
    inverse_y=True,
    load2gpu_on_the_fly=True,
    white_bkgd=True,
)

coarse_train = dict(pervoxel_lr_downrate=2)
""")

write("free_dataset/free_default.py", """_base_ = '../default.py'

model = 'FourierGrid'
basedir = './logs/free'

data = dict(
    dataset_type='free',
    factor=2,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=40000,
    N_rand=4096,
    lrate_decay=80,
    ray_sampler='flatten',
    weight_nearclip=1.0,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000],
    tv_before=20000,
    tv_dense_before=20000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
)

alpha_init = 1e-4
stepsize = 0.5

fine_model_and_render = dict(
    num_voxels_rgb=320**3,
    num_voxels_density=320**3,
    num_voxels_base_rgb=320**3,
    num_voxels_base_density=320**3,
    alpha_init=alpha_init,
    stepsize=stepsize,
    fast_color_thres={
        '_delete_': True,
        0: alpha_init * stepsize / 10,
        1500: min(alpha_init, 1e-4) * stepsize / 5,
        2500: min(alpha_init, 1e-4) * stepsize / 2,
        3500: min(alpha_init, 1e-4) * stepsize / 1.5,
        4500: min(alpha_init, 1e-4) * stepsize,
        5500: min(alpha_init, 1e-4),
        6500: 1e-4,
    },
    world_bound_scale=1,
)
""")
FREE = ["grass", "hydrant", "lab", "pillar", "road", "sky", "stair"]
for s in FREE:
    write(f"free_dataset/{s}.py", f"""_base_ = './free_default.py'

expname = 'fouriergrid_free_{s}'

data = dict(datadir='./data/free_dataset/{s}')
""")

write("nerf_studio/nerf_studio_default.py", """_base_ = '../default.py'

basedir = './logs/nerf_studio'

data = dict(
    dataset_type='nerfstudio',
    factor=4,
    dvgohold=8,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=40000,
    N_rand=4096,
    lrate_decay=80,
    ray_sampler='flatten',
    weight_nearclip=1.0,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000],
    tv_before=20000,
    tv_dense_before=20000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
)
""")
for s in ["poster", "dozer", "desolation"]:
    write(f"nerf_studio/{s}.py", f"""_base_ = './nerf_studio_default.py'

expname = 'dvgo_ns_{s}'

data = dict(datadir='./data/nerfstudio/{s}')
""")

write("co3d/co3d_default.py", """_base_ = '../default.py'

basedir = './logs/co3d'

data = dict(
    dataset_type='co3d',
    inverse_y=True,
    flip_x=True,
    flip_y=True,
    white_bkgd=True,
)
""")
write("co3d/teddybear.py", """_base_ = './co3d_default.py'

expname = 'dvgo_co3d_teddybear'

data = dict(
    datadir='./data/co3d/teddybear/34_1479_4753',
    annot_path='./data/co3d/teddybear/frame_annotations.jgz',
    split_path='./data/co3d/teddybear/set_lists.json',
    sequence_name='34_1479_4753',
)
""")

write("custom/default_forward_facing.py", """_base_ = '../default.py'

basedir = './logs/custom'

data = dict(
    dataset_type='llff',
    ndc=True,
    factor=4,
)

fine_model_and_render = dict(
    num_voxels_rgb=256**3,
    num_voxels_density=256**3,
    mpi_depth=128,
    rgbnet_dim=9,
    rgbnet_width=64,
    fast_color_thres=1e-3,
)
""")
write("custom/default_ubd_inward_facing.py", """_base_ = '../default.py'

basedir = './logs/custom'

data = dict(
    dataset_type='llff',
    spherify=True,
    factor=4,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=40000,
    N_rand=4096,
    lrate_decay=80,
    ray_sampler='flatten',
    weight_nearclip=1.0,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000, 10000, 12000, 14000, 16000],
    tv_before=20000,
    tv_dense_before=20000,
    weight_tv_density=1e-6,
    weight_tv_k0=1e-7,
)
""")

print("configs generated")
