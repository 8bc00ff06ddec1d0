"""Test configuration: run JAX on a virtual 8-device CPU platform.

Must set the environment before the first ``jax`` import anywhere in the
test session (the driver's multi-chip dry-run uses the same mechanism).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU backend
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The environment may have already imported jax and registered a TPU backend
# (e.g. via a sitecustomize hook), in which case the env var above is too
# late — force the platform through the config as well.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache makes repeat test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
