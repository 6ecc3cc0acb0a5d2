"""Config loader (_base_ inheritance, _delete_, schedules) and checkpoint
round-trip / block-merge tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.configs import loader
from unboundednerfpytorch_tpu.utils import checkpoint as ckpt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_base_inheritance_and_delete(tmp_path):
    (tmp_path / "base.py").write_text(
        "expname='base'\n"
        "data=dict(dataset_type='blender', white_bkgd=True, factor=4)\n"
        "fine_train=dict(N_iters=100, N_rand=512)\n"
    )
    (tmp_path / "child.py").write_text(
        "_base_='./base.py'\n"
        "expname='child'\n"
        "data=dict(factor=8)\n"
        "fine_train=dict(_delete_=True, N_iters=7)\n"
    )
    cfg = loader.load_config(str(tmp_path / "child.py"))
    assert cfg.expname == "child"
    assert cfg.data.dataset_type == "blender"  # inherited
    assert cfg.data.factor == 8  # overridden
    assert cfg.fine_train.N_iters == 7  # _delete_ replaced the dict
    # N_rand falls back to the schema default after _delete_
    assert cfg.fine_train.N_rand == 8192


def test_shipped_configs_load():
    paths = [
        "configs/nerf/lego.py",
        "configs/nerf_unbounded/garden_single.py",
        "configs/tankstemple_unbounded/truck_single.py",
        "configs/waymo/waymo_base.py",
        "configs/llff/fern.py",
        "configs/tiny/lego_tiny.py",
        "configs/lf/africa.py",
        "configs/mega/building.py",
    ]
    for p in paths:
        cfg = loader.load_config(os.path.join(REPO, p))
        assert cfg.fine_train.N_iters > 0, p

    garden = loader.load_config(os.path.join(REPO, "configs/nerf_unbounded/garden_single.py"))
    sched = dict(garden.fine_model_and_render.fast_color_thres_schedule)
    assert 0 in sched and 6500 in sched
    assert sched[6500] == pytest.approx(1e-4)
    assert garden.model == "FourierGrid"
    assert garden.fine_train.N_iters == 100000


def test_checkpoint_roundtrip(tmp_path):
    from unboundednerfpytorch_tpu.models import dvgo

    cfg = dvgo.DVGOConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
        num_voxels=12**3, num_voxels_base=12**3, rgbnet_dim=4, alpha_init=1e-2,
    )
    params = dvgo.create(cfg, jax.random.PRNGKey(0))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid + jax.random.normal(jax.random.PRNGKey(1), params.density.grid.shape)
        )
    )
    path = str(tmp_path / "ck")
    ckpt.save_model(path, "dvgo", cfg, params, global_step=42)
    fam, cfg2, params2, step, _ = ckpt.load_model(path)
    assert fam == "dvgo" and step == 42
    assert cfg2.num_voxels == cfg.num_voxels
    np.testing.assert_allclose(
        np.asarray(params2.density.grid), np.asarray(params.density.grid)
    )
    np.testing.assert_allclose(
        np.asarray(params2.rgbnet.weights[0]), np.asarray(params.rgbnet.weights[0])
    )


def test_block_merge_elementwise_min(tmp_path):
    from unboundednerfpytorch_tpu.models import dvgo

    cfg = dvgo.DVGOConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
        num_voxels=8**3, num_voxels_base=8**3,
    )
    k = jax.random.PRNGKey(0)
    pa = dvgo.create(cfg, k)
    pb = dvgo.create(cfg, k)
    ga = jax.random.normal(jax.random.PRNGKey(1), pa.density.grid.shape)
    gb = jax.random.normal(jax.random.PRNGKey(2), pb.density.grid.shape)
    pa = pa.replace(density=pa.density.replace(grid=ga))
    pb = pb.replace(density=pb.density.replace(grid=gb))
    ckpt.save_model(str(tmp_path / "b0"), "dvgo", cfg, pa)
    ckpt.save_model(str(tmp_path / "b1"), "dvgo", cfg, pb)
    ckpt.merge_blocks([str(tmp_path / "b0"), str(tmp_path / "b1")], str(tmp_path / "merged"))
    _, _, merged, _, _ = ckpt.load_model(str(tmp_path / "merged"))
    np.testing.assert_allclose(
        np.asarray(merged.density.grid),
        np.minimum(np.asarray(ga), np.asarray(gb)),
        rtol=1e-6,
    )
