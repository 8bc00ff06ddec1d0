"""Utilities: profiling / tracing."""
from shadowing_tpu.utils.profiling import (
    device_trace,
    phase_timer,
    reset_timings,
    timings,
)
