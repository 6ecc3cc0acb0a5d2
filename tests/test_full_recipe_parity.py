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
