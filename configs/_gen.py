#!/usr/bin/env python
"""Generate the scene-config files that mirror the reference's 123-file
config surface (``/root/reference/FourierGrid/configs/*``), translated onto
this repo's schema. Re-runnable; never overwrites an existing file.

Usage: python configs/_gen.py
"""

from __future__ import annotations

import os

HERE = os.path.dirname(os.path.abspath(__file__))

FILES: dict[str, str] = {}

# ---------------------------------------------------------------- linemod
# Reference: configs/linemod/*.py — per-object crops (width_max/height_max)
# over a shared recipe (white bkgd, on-the-fly ray store, 10-20k iters).
FILES["linemod/linemod_default.py"] = """\
_base_ = '../default.py'

basedir = './logs/linemod'

data = dict(
    dataset_type='linemod',
    white_bkgd=True,
    load2gpu_on_the_fly=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=20000,
)
"""

_LINEMOD_SIZES = {
    "ape": 90, "benchvise": 230, "camera": 150, "can": 190, "cat": 130,
    "driller": 250, "duck": 90, "eggbox": 140, "glue": 150,
    "holepuncher": 120, "iron": 240, "lamp": 260, "phone": 190,
}
for _name, _sz in _LINEMOD_SIZES.items():
    _extra = ""
    if _name == "ape":  # reference ape.py: seq_id=1, shorter schedule
        _extra = "    seq_id=1,\n"
    _iters = "\nfine_train = dict(N_iters=10000)\n" if _name == "ape" else ""
    FILES[f"linemod/{_name}.py"] = f"""\
_base_ = './linemod_default.py'

expname = 'fouriergrid_{_name}'

data = dict(
    datadir='./data/linemod',
    seq_name='{_name}',
{_extra}    width_max={_sz},
    height_max={_sz},
)
{_iters}"""

# ---------------------------------------------------------------- llff _lg
# Reference llff_default_lg.py: full-resolution (1008x756) MPI recipe with
# 256 planes, distortion + TV regularizers, 'flatten' sampler.
FILES["llff/llff_default_lg.py"] = """\
_base_ = '../default.py'

basedir = './logs/llff'

data = dict(
    dataset_type='llff',
    ndc=True,
    width=1008,
    height=756,
    rand_bkgd=True,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=30000,
    N_rand=4096,
    weight_distortion=0.01,
    pg_scale=[2000, 4000, 6000, 8000],
    decay_after_scale=0.1,
    ray_sampler='flatten',
    tv_before=1e9,
    tv_dense_before=10000,
    weight_tv_density=1e-5,
    weight_tv_k0=1e-6,
)

_mpi_depth = 256
_stepsize = 1.0

fine_model_and_render = dict(
    num_voxels=384 * 384 * _mpi_depth,
    mpi_depth=_mpi_depth,
    stepsize=_stepsize,
    rgbnet_dim=9,
    rgbnet_width=64,
    world_bound_scale=1,
    fast_color_thres=_stepsize / _mpi_depth / 5,
)
"""

for _scene in ("fern", "flower", "fortress", "horns", "leaves", "orchids",
               "room", "trex"):
    FILES[f"llff/{_scene}_lg.py"] = f"""\
_base_ = './llff_default_lg.py'

expname = '{_scene}_lg'

data = dict(
    datadir='./data/nerf_llff_data/{_scene}',
)
"""

# ---------------------------------------------------------------- nerf
FILES["nerf/ship.tensorf.py"] = """\
_base_ = '../default.py'

expname = 'dvgo_ship_tensorf'
basedir = './logs/nerf_synthetic'

data = dict(
    datadir='./data/nerf_synthetic/ship',
    dataset_type='blender',
    white_bkgd=True,
)

fine_train = dict(
    lrate_density=0.02,
    lrate_k0=0.02,
    pg_scale=[1000, 2000, 3000, 4000, 5000, 6000],
)

fine_model_and_render = dict(
    num_voxels=384**3,
    density_type='TensoRFGrid',
    density_config=dict(n_comp=8),
    k0_type='TensoRFGrid',
    k0_config=dict(n_comp=24),
)
"""

# ------------------------------------------------------- nerf_unbounded
# Non-"_single" variants: the dcvgo recipe of nerf_unbounded_default.py with
# per-scene datadir/factor (reference garden.py etc.).
_UNBOUNDED_360 = {
    "bicycle": 4, "bonsai": 2, "counter": 2, "garden": 4,
    "kitchen": 2, "room": 2, "stump": 4,
}
for _scene, _factor in _UNBOUNDED_360.items():
    FILES[f"nerf_unbounded/{_scene}.py"] = f"""\
_base_ = './nerf_unbounded_default.py'

expname = 'dvgo_{_scene}_unbounded'

data = dict(
    datadir='./data/360_v2/{_scene}',
    factor={_factor},
)
"""

# ---------------------------------------------------------- tankstemple
# _lg variants (reference Barn_lg.py): bounded dvgo at 256^3 with
# progressive scaling; singles: the FourierGrid unbounded recipe.
FILES["tankstemple/tankstemple_lg_default.py"] = """\
_base_ = '../default.py'

basedir = './logs/tanks_and_temple'

data = dict(
    dataset_type='tankstemple',
    inverse_y=True,
    load2gpu_on_the_fly=True,
    white_bkgd=True,
)

coarse_train = dict(
    pervoxel_lr_downrate=2,
)

fine_train = dict(pg_scale=[1000, 2000, 3000, 4000, 5000, 6000])

fine_model_and_render = dict(num_voxels=256**3)
"""

for _scene in ("Barn", "Caterpillar", "Family", "Ignatius", "Truck"):
    FILES[f"tankstemple/{_scene}_lg.py"] = f"""\
_base_ = './tankstemple_lg_default.py'

expname = 'dvgo_{_scene}_lg'

data = dict(
    datadir='./data/TanksAndTemple/{_scene}',
)
"""

FILES["tankstemple/tankstemple_single_default.py"] = """\
_base_ = '../default.py'

model = 'FourierGrid'
basedir = './logs/tanks_and_temple'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    dataset_type='tankstemple',
    inverse_y=True,
    load2gpu_on_the_fly=True,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
    unbounded_inner_r=1.0,
    ndc=False,
)

coarse_train = dict(N_iters=0, pervoxel_lr=False)

fine_train = dict(
    N_iters=100000,
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
    rgbnet_dim=12,
    maskout_near_cam_vox=False,
)
"""

for _scene in ("barn", "caterpillar", "family"):
    FILES[f"tankstemple/{_scene}_single.py"] = f"""\
_base_ = './tankstemple_single_default.py'

expname = 'fouriergrid_{_scene}'

data = dict(
    datadir='./data/TanksAndTemple/{_scene.capitalize()}',
)
"""

# ------------------------------------------- tankstemple_unbounded
# tt_default.py: the dcvgo unbounded-inward recipe over nerf++ splits.
FILES["tankstemple_unbounded/tt_default.py"] = """\
_base_ = '../default.py'

basedir = './logs/tanks_and_temple_unbounded'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    dataset_type='nerfpp',
    inverse_y=True,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
    load2gpu_on_the_fly=True,
)

coarse_train = dict(N_iters=0, pervoxel_lr=False)

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

coarse_model_and_render = dict(maskout_near_cam_vox=False)

fine_model_and_render = dict(
    num_voxels=320**3,
    num_voxels_base=320**3,
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
    maskout_near_cam_vox=False,
)
"""

_TT_UNBOUNDED = {
    "M60": "tat_intermediate_M60",
    "Playground": "tat_intermediate_Playground",
    "Train": "tat_intermediate_Train",
    "Truck": "tat_training_Truck",
}
for _scene, _dir in _TT_UNBOUNDED.items():
    FILES[f"tankstemple_unbounded/{_scene}.py"] = f"""\
_base_ = './tt_default.py'

expname = 'dvgo_{_scene}_unbounded'

data = dict(
    datadir='./data/tanks_and_temples/{_dir}',
)
"""

# ---------------------------------------------------------------- waymo
# waymo_no_block.py (reference): the full single-model FourierGrid city
# recipe — 300^3 grids, per-camera training ids, pose-search bounds.
FILES["waymo/waymo_no_block.py"] = """\
_base_ = './waymo_base.py'

model = 'FourierGrid'
expname = 'fouriergrid_waymo_no_block'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    datadir='./data/waymo_ordered_dataset',
    factor=2,
    near_clip=0.1,
    near=0.1,
    far=0.01,
    rand_bkgd=True,
    test_rotate_angle=360,
    sample_interval=1,
    num_per_block=-1,
    unbounded_inner_r=0.8,
    training_ids=['73_%d' % i for i in range(50)],
)

fine_train = dict(
    N_iters=3000,
    N_rand=2048,
    pg_scale=[3000, 4000, 5000, 6000, 7000],
    pervoxel_lr=False,
    lrate_decay=20,
    weight_entropy_last=1e-3,
    weight_rgbper=1e-2,
    weight_nearclip=0,
    weight_main=3.0,
    weight_freq=1.0,
    weight_distortion=-1,
)

fine_model_and_render = dict(
    num_voxels_density=300**3,
    num_voxels_base_density=300**3,
    num_voxels_rgb=300**3,
    num_voxels_base_rgb=300**3,
    num_voxels_viewdir=-1,
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
    rgbnet_dim=3,
    bg_len=0.2,
    viewbase_pe=2,
    maskout_near_cam_vox=False,
)
"""

# waymo_block.py (reference): block experiment — 5 images per block over the
# camera-73 sequence, 40k iters.
FILES["waymo/waymo_block.py"] = """\
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
"""

# block_0_llff.py / block_0_tt.py: single-block Waymo experiments. NOTE the
# reference files point at bases (default_waymo.py / tankstemple_base.py)
# that do not exist in its tree — these translations ground them on
# waymo_base.py with the same overrides.
FILES["waymo/block_0_llff.py"] = """\
_base_ = './waymo_base.py'

model = 'FourierGrid'
expname = 'fouriergrid_waymo_block0_llff'

data = dict(
    datadir='./data/waymo_block0/dense',
    factor=2,
    movie_render_kwargs={
        'scale_r': 1.0,
        'scale_f': 0.8,
        'zrate': 2.0,
        'zdelta': 0.5,
    },
)

fine_train = dict(
    N_iters=300000,
)
"""

FILES["waymo/block_0_tt.py"] = """\
_base_ = './waymo_base.py'

model = 'FourierGrid'
expname = 'fouriergrid_waymo_block0_tt'

data = dict(
    datadir='./data/waymo_block0/dense',
    factor=2,
    movie_render_kwargs={
        'scale_r': 1.0,
        'scale_f': 0.8,
        'zrate': 2.0,
        'zdelta': 0.5,
    },
)

fine_train = dict(
    N_iters=30000,
)
"""

# ---------------------------------------------------------------- custom
_CUSTOM_FF = {
    "Madoka": ("data/Madoka/dense", 300000, None),
    "Madoka_long": ("data/Madoka/dense", 300000,
                    [50000, 100000, 150000, 200000]),
    "Otobai": ("data/Otobai/dense", 300000, None),
    "sm01_desktop": ("./data/sm01_desktop/dense", None, None),
    "sm02_multiple_desktop": ("./data/sm02_multiple_desktop/dense", None, None),
    "sm03_meeting": ("./data/sm03_meeting/dense", None, None),
}
for _scene, (_dir, _iters, _pg) in _CUSTOM_FF.items():
    _train_lines = []
    if _iters:
        _train_lines.append(f"    N_iters={_iters},")
    if _pg:
        _train_lines.append(f"    pg_scale={_pg},")
    _train = (
        "\nfine_train = dict(\n" + "\n".join(_train_lines) + "\n)\n"
        if _train_lines else ""
    )
    FILES[f"custom/{_scene}.py"] = f"""\
_base_ = './default_forward_facing.py'

expname = '{_scene}'

data = dict(
    datadir='{_dir}',
    factor=2,
    movie_render_kwargs={{
        'scale_r': 1.0,
        'scale_f': 0.8,
        'zrate': 2.0,
        'zdelta': 0.5,
    }},
)
{_train}"""

# ---------------------------------------------------------------- mega
FILES["mega/building_no_block.py"] = """\
_base_ = './building.py'

expname = 'fouriergrid_mega_building_no_block'

data = dict(
    num_per_block=-1,
)
"""

# ------------------------------------------------------------ nerf_studio
FILES["nerf_studio/Giannini_Hall.py"] = """\
_base_ = './nerf_studio_default.py'

model = 'FourierGrid'
expname = 'fouriergrid_giannini_hall'
basedir = './logs/Giannini-Hall'

alpha_init = 1e-4
stepsize = 0.5

data = dict(
    datadir='./data/nerfstudio_data/Giannini-Hall',
    factor=8,
    llffhold=-1,
    dvgohold=8,
    white_bkgd=True,
    rand_bkgd=True,
    unbounded_inward=True,
    load2gpu_on_the_fly=True,
    movie_render_kwargs=dict(
        shift_x=0.0,
        shift_y=-0.3,
        shift_z=0,
        scale_r=0.2,
        pitch_deg=-40,
    ),
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=100000,
    N_rand=2048,
    weight_distortion=0.02,
    pervoxel_lr=False,
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
    maskout_near_cam_vox=False,
)
"""

FILES["nerf_studio/stump.py"] = """\
_base_ = './Giannini_Hall.py'

expname = 'fouriergrid_nerfstudio_stump'
basedir = './logs/nerfstudio_stump'

data = dict(
    datadir='./data/nerfstudio_data/stump',
    bd_factor=None,
)

fine_train = dict(
    N_iters=10000,
)
"""

# ---------------------------------------------------------------- co3d
FILES["co3d/donut_369_40208_78816.py"] = """\
_base_ = './co3d_default.py'

expname = 'dvgo_donut_369_40208_78816'

data = dict(
    datadir='./data/co3d/',
    annot_path='./data/co3d/donut/frame_annotations.jgz',
    split_path='./data/co3d/donut/set_lists.json',
    sequence_name='369_40208_78816',
)
"""


def main() -> None:
    created, skipped = [], []
    for rel, content in FILES.items():
        path = os.path.join(HERE, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if os.path.exists(path):
            skipped.append(rel)
            continue
        with open(path, "w") as f:
            f.write(content)
        created.append(rel)
    print(f"created {len(created)} configs, skipped {len(skipped)} existing")
    for rel in created:
        print(f"  + {rel}")


if __name__ == "__main__":
    main()
