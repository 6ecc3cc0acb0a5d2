"""Every reference scene config (`/root/reference/FourierGrid/configs/*`)
must have a same-named counterpart here that loads through the config
system — the VERDICT round-1 config-surface parity gate."""

import glob
import os

import pytest

from unboundednerfpytorch_tpu.configs import loader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/FourierGrid/configs"


def _reference_configs():
    if not os.path.isdir(REF):
        return []
    out = []
    for path in sorted(glob.glob(os.path.join(REF, "*", "*.py"))):
        rel = os.path.relpath(path, REF)
        out.append(rel)
    return out


_REF_CONFIGS = _reference_configs()


@pytest.mark.skipif(not _REF_CONFIGS, reason="reference tree not present")
def test_reference_config_count():
    assert len(_REF_CONFIGS) >= 120


@pytest.mark.skipif(not _REF_CONFIGS, reason="reference tree not present")
@pytest.mark.parametrize("rel", _REF_CONFIGS)
def test_config_counterpart_loads(rel):
    ours = os.path.join(REPO, "configs", rel)
    assert os.path.exists(ours), f"missing counterpart for reference {rel}"
    cfg = loader.load_config(ours)
    assert cfg.fine_train.N_iters >= 0


def test_linemod_family_semantics():
    cfg = loader.load_config(os.path.join(REPO, "configs/linemod/ape.py"))
    assert cfg.data.dataset_type == "linemod"
    assert cfg.data.seq_name == "ape"
    assert cfg.data.width_max == 90
    assert cfg.data.white_bkgd
    assert cfg.fine_train.N_iters == 10000
    lamp = loader.load_config(os.path.join(REPO, "configs/linemod/lamp.py"))
    assert lamp.data.width_max == 260


def test_num_voxels_alias():
    cfg = loader.load_config(
        os.path.join(REPO, "configs/tankstemple/Barn_lg.py")
    )
    assert cfg.fine_model_and_render.num_voxels_rgb == 256**3
    assert cfg.fine_model_and_render.num_voxels_density == 256**3


def test_waymo_block_config():
    cfg = loader.load_config(os.path.join(REPO, "configs/waymo/waymo_block.py"))
    assert cfg.data.num_per_block == 5
    assert cfg.data.sample_cam == 73
    assert cfg.fine_train.N_iters == 40000
    assert cfg.model == "FourierGrid"


def test_visualize_poses_debug_mode():
    """The reference's visualize_poses debug regime (waymo_base.py:11-27):
    the config-file toggle AND the CLI-level transformation both flip the
    recipe into a 600-iter coarse run with a flat threshold and no
    distortion loss."""
    import os

    from unboundednerfpytorch_tpu.configs import loader

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
    path = os.path.join(root, "waymo", "waymo_base.py")

    # base file carries the toggle (defaults off)
    src = open(path).read()
    assert "visualize_poses = False" in src

    cfg = loader.load_config(path, visualize_poses=True)
    assert cfg.coarse_train.N_iters == 600
    assert cfg.fine_train.weight_distortion == 0.0
    from unboundednerfpytorch_tpu.configs.schema import normalize_fast_color_thres

    thres, sched = normalize_fast_color_thres(cfg.fine_model_and_render)
    assert sched == ()  # flat: the step-keyed schedule is cleared
    assert abs(thres - 0.5 / 256 / 5) < 1e-9

    # the untouched load still has the full recipe
    cfg0 = loader.load_config(path)
    assert cfg0.coarse_train.N_iters == 0
    _, sched0 = normalize_fast_color_thres(cfg0.fine_model_and_render)
    assert len(sched0) >= 6
