"""Training-TRAJECTORY parity gate (VERDICT r2 item 4): the framework's
production train step and an independent torch implementation of the
reference recipe (grids + scan + masked Adam) must reach the same held-out
PSNR (±0.1 dB) when trained on identical data with identical ray batches.

Complements the single-step forward/grad allclose gates
(tests/test_torch_parity.py) — this one catches optimizer-math, lr-decay and
loss-assembly divergence that a one-step gate cannot."""

import importlib.util
import os

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


def test_trajectory_parity_tiny():
    mod = _load_parity_run()
    out = mod.run_trajectory_parity(
        steps=60, n_rand=512, tol_db=0.1, log=lambda *a: None
    )
    assert out["delta_db"] <= 0.1
    # both sides actually learned something (not matching at noise level)
    assert out["psnr_jax"] > 14.0, out


def test_trajectory_parity_pervoxel_lr():
    """DVGO recipe with the per-voxel learning rate live on both sides: the
    density grid's lr is scaled by view counts (voxel_count_views), taking
    the adam_upd_with_perlr optimizer path instead of skip-zero-grad."""
    mod = _load_parity_run()
    out = mod.run_trajectory_parity(
        steps=60, n_rand=512, tol_db=0.1, log=lambda *a: None,
        pervoxel_lr=True,
    )
    assert out["delta_db"] <= 0.1
    assert out["psnr_jax"] > 14.0, out


def test_trajectory_parity_fourier_tiny():
    """Flagship FourierGrid recipe: contracted sampling + 2K+1 Fourier banks
    + packed-corner gathers + masked Adam vs the independent torch mirror."""
    mod = _load_parity_run()
    out = mod.run_trajectory_parity_fourier(
        steps=60, n_rand=512, tol_db=0.1, log=lambda *a: None
    )
    assert out["delta_db"] <= 0.1
    assert out["psnr_jax"] > 18.0, out


def test_trajectory_parity_fourier_loss_zoo():
    """Same recipe with the FULL production loss assembly live on both sides:
    entropy_last + rgbper (detached weights) + prefix-sum distortion + TV
    gradient injection (dense AND sparse modes across tv_dense_before)."""
    mod = _load_parity_run()
    out = mod.run_trajectory_parity_fourier(
        steps=60, n_rand=512, tol_db=0.1, log=lambda *a: None, loss_zoo=True
    )
    assert out["delta_db"] <= 0.1
    assert out["psnr_jax"] > 18.0, out


def test_trajectory_parity_fourier_pg_boundary_with_zoo():
    """Crossing a progressive-upsampling boundary mid-training — trilinear
    grid resample, act_shift decay, optimizer rebuilt from scratch, lr decay
    re-anchored (run_train.py:187-201) — with the loss zoo live, each side
    mirrored independently."""
    mod = _load_parity_run()
    out = mod.run_trajectory_parity_fourier(
        steps=60, n_rand=512, tol_db=0.1, log=lambda *a: None,
        loss_zoo=True, pg_boundary=30,
    )
    assert out["delta_db"] <= 0.1
    assert out["psnr_jax"] > 17.0, out


def test_trajectory_parity_dmpigo_tiny():
    """DMPIGO (MPI) recipe: NDC equidistant sampling + per-depth act_shift
    line grid + zero-PE rgb head vs the independent torch mirror."""
    mod = _load_parity_run()
    out = mod.run_trajectory_parity_dmpigo(
        steps=60, n_rand=512, tol_db=0.1, log=lambda *a: None
    )
    assert out["delta_db"] <= 0.1
    assert out["psnr_jax"] > 12.0, out
