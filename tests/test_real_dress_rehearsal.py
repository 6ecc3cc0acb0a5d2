"""Dress rehearsal for the real-data benchmark entry (VERDICT r3 #8): a
synthetic scene materialized in the EXACT 360_v2/garden LLFF on-disk layout
runs through the ACTUAL parity_run --real path — config inheritance from
garden_single.py, load_everything's llff loader (pre-minified images_8,
poses_bounds.npy, spherify, bd_factor), run_train incl. a pg boundary, and
render_test — so the first machine with real data runs it unmodified."""

import importlib.util
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _load_parity_run():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "parity_run.py",
    )
    spec = importlib.util.spec_from_file_location("parity_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_real_entry_dress_rehearsal(tmp_path, monkeypatch):
    from unboundednerfpytorch_tpu.data import synthetic

    data_root = tmp_path / "data"
    scene_dir = data_root / "360_v2" / "garden"
    synthetic.write_fake_360_scene(str(scene_dir), n_views=10, H=32, W=32)
    assert (scene_dir / "poses_bounds.npy").exists()
    assert len(list((scene_dir / "images_8").glob("*.png"))) == 10

    monkeypatch.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    mod = _load_parity_run()
    failures = mod.run_real(
        str(data_root), ["garden"], quick=True, work_dir=str(tmp_path / "wk")
    )
    assert failures == 0
    # the run produced a fine checkpoint in the derived exp dir
    logs = tmp_path / "wk" / "logs"
    found = list(logs.rglob("fine_last/meta.json"))
    assert found, f"no fine checkpoint under {logs}"
