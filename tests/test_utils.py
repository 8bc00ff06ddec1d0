"""Profiling utilities."""
import numpy as np

from shadowing_tpu.utils.profiling import (
    device_trace,
    phase_timer,
    reset_timings,
    timings,
)


def test_phase_timer_accumulates():
    reset_timings()
    with phase_timer("unit", verbose=False):
        _ = np.arange(10).sum()
    with phase_timer("unit", verbose=False):
        _ = np.arange(10).sum()
    t = timings()
    assert t["unit"]["count"] == 2
    assert t["unit"]["total_s"] >= t["unit"]["mean_s"]
    reset_timings()
    assert timings() == {}


def test_device_trace_disabled_noop(tmp_path):
    with device_trace(str(tmp_path), enabled=False):
        pass  # must not create trace files
    assert list(tmp_path.iterdir()) == []


def test_device_trace_captures(tmp_path):
    import jax.numpy as jnp

    with device_trace(str(tmp_path)):
        jnp.arange(16).sum().block_until_ready()
    assert any(tmp_path.rglob("*"))  # trace artifacts written
