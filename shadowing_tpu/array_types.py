"""Array conventions shared across the framework.

The framework follows the reference's ``(B, C, T)`` convention for time
series (batch, channels, time) — see ``/root/reference``'s
``shadowing/path_shadowing/path_shadowing.py:16-26`` (``_dim_array``) — but is
backed by JAX arrays / numpy instead of torch.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jax.Array]


def dim_bct(x: Array) -> Array:
    """Coerce ``x`` to the canonical ``(B, C, T)`` shape.

    1-d arrays are treated as a single-channel time series, 2-d arrays as a
    batch of single-channel series. Mirrors the coercion rules of the
    reference (``path_shadowing.py:16-26``) without copying data.
    """
    if x.ndim == 1:
        return x[None, None, :]
    if x.ndim == 2:
        return x[:, None, :]
    if x.ndim == 3:
        return x
    raise ValueError(
        f"cannot coerce array of ndim={x.ndim} to (B, C, T); expected 1-3 dims"
    )


def as_jax_f32(x: Array) -> jax.Array:
    """Convert to a float32 JAX array (device placement left to the caller)."""
    if isinstance(x, jax.Array) and x.dtype == jnp.float32:
        return x
    return jnp.asarray(x, dtype=jnp.float32)


def as_numpy(x: Array) -> np.ndarray:
    """Materialise to host numpy."""
    if isinstance(x, np.ndarray):
        return x
    return np.asarray(x)
