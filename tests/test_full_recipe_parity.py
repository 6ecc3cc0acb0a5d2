"""Full-recipe convergence-parity gate (VERDICT r3 next-round #1).

The COMPLETE flagship garden schedule — pg_scale boundaries with occupancy
refreshes, the step-keyed fast_color_thres schedule, TV injection through
its gates, nearclip/distortion/entropy/rgbper, rand_bkgd, flatten sampler,
the shipped TPU fast paths (sample budget, two-stage training) — through
BOTH the production loop (train/loop.run_train) and an independent torch
mirror of the reference recipe on IDENTICAL batch streams.

The default (slow-suite) test runs the compressed smoke schedule (600
steps, all schedule elements crossed). The FULL 30k-step gate runs via

  RUN_FULL_RECIPE=1 pytest tests/test_full_recipe_parity.py -m slow

or the tools/full_recipe_parity.py phases directly (see BASELINE.md for the
recorded converged numbers)."""

import importlib.util
import json
import os

import pytest

pytestmark = pytest.mark.slow


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "full_recipe_parity.py",
    )
    spec = importlib.util.spec_from_file_location("full_recipe_parity", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_full_recipe_parity(tmp_path):
    mod = _load()
    full = os.environ.get("RUN_FULL_RECIPE", "") == "1"
    smoke = not full
    out = str(tmp_path / "frp")
    os.makedirs(out, exist_ok=True)
    mod.run_production(out, smoke, "f32", log=lambda *a: None)
    mod.run_torch_mirror(out, smoke, log=lambda *a: None)
    # smoke tolerance: 600 steps is far from converged — the gate is that
    # the two implementations track (the 30k run gates at 0.1 dB)
    result = mod.compare(out, tol_db=0.1 if full else 1.0)
    assert result["passed"]
    # The curve-tail overlay is a SMOKE-scale gate only: over a 30k-step
    # run the two implementations' per-batch PSNR curves decohere
    # chaotically (f32 reduction-order differences amplify; measured
    # round 4: sign-BALANCED oscillation of ±1-7 dB from ~step 6000 while
    # converged held-out quality stays equal) — the full-run gate is the
    # held-out delta above, not the batch-psnr overlay.
    if not full and result["curve_tail_mean_delta_db"] is not None:
        assert result["curve_tail_mean_delta_db"] < 1.0


def test_null_distribution_aggregation(tmp_path):
    """--phase null: per-seed results aggregate into the seed-null record
    (production spread + per-seed cross-implementation deltas)."""
    mod = _load()
    out = str(tmp_path / "frp")
    os.makedirs(out, exist_ok=True)
    for seed, psnr in ((777, 14.17), (1001, 14.02), (1002, 14.31)):
        sfx = "" if seed == 777 else f"_s{seed}"
        with open(os.path.join(out, f"production_f32{sfx}.json"), "w") as f:
            json.dump({"test_psnr": psnr, "seed": seed}, f)
    for seed, psnr in ((777, 14.30), (1001, 13.95)):
        sfx = "" if seed == 777 else f"_s{seed}"
        with open(os.path.join(out, f"torch{sfx}.json"), "w") as f:
            json.dump({"test_psnr": psnr, "seed": seed}, f)
    rec = mod.null_distribution(out, log=lambda *a: None)
    assert set(rec["production_seeds"]) == {"777", "1001", "1002"}
    assert set(rec["cross_impl_deltas_db"]) == {777, 1001}
    assert abs(rec["cross_impl_deltas_db"][777] - (14.17 - 14.30)) < 1e-6
    assert rec["production_std_db"] is not None
    assert rec["production_range_db"] == round(14.31 - 14.02, 4)
    assert os.path.exists(os.path.join(out, "null.json"))
