"""Small utility-layer gates: profiling aggregators, xprof trace capture,
and the persistent compilation cache's platform gating."""

import os

import numpy as np

from unboundednerfpytorch_tpu.utils import compile_cache, profiling


def test_step_timer_summary():
    t = profiling.StepTimer(warmup=1)
    import time

    for _ in range(6):
        t.tick()
        time.sleep(0.01)
    s = t.summary()
    assert s["n"] == 4  # first tick sets baseline, next `warmup` dropped
    assert 0.005 < s["p50_s"] < 0.1
    assert s["steps_per_s"] > 5


def test_rays_per_second():
    m = profiling.RaysPerSecond()
    assert m.value == 0.0
    m.add(1000, 0.5)
    m.add(1000, 0.5)
    assert m.value == 2000.0


def test_trace_writes_xprof_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # xprof lays out plugins/profile/<run>/...
    found = []
    for root, _, files in os.walk(str(tmp_path)):
        found.extend(files)
    assert found, "no trace artifacts written"


def test_compile_cache_skips_explicit_cpu(tmp_path, monkeypatch):
    """On explicit-CPU platforms the persistent cache is disabled (XLA:CPU
    AOT entries are machine-feature-pinned; 'may SIGILL' on reload)."""
    # tests/conftest.py hard-assigns jax_platforms=cpu
    out = compile_cache.enable_persistent_compilation_cache(str(tmp_path))
    assert out is None


def test_compile_cache_env_off(monkeypatch, tmp_path):
    monkeypatch.setenv("UNBNERF_COMPILE_CACHE", "off")
    assert compile_cache.enable_persistent_compilation_cache(
        str(tmp_path)
    ) is None
