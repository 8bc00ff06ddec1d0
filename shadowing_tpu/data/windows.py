"""Sliding-window extraction along the trailing time axis.

Replaces the ``scatspectra.windows`` surface used by the reference
(``/root/reference/shadowing/PDV/PDV.py:108-112`` and ``tutorial.ipynb``
cell 5): windows of width ``w`` and stride ``s`` are stacked on a new axis
inserted *before* the time axis, so a ``(..., T)`` input becomes
``(..., n_windows, w)``.

Implemented with ``numpy.lib.stride_tricks`` on host arrays (a strided view
materialised into one contiguous copy — downstream device transfers need
contiguous memory) and with gather on JAX arrays, so it is usable both for
data preparation and inside jitted code (static ``w``/``s``/``offset``).
"""
from __future__ import annotations

import numpy as np

from shadowing_tpu.array_types import Array


def n_windows(T: int, w: int, s: int, offset: int = 0) -> int:
    """Number of complete windows of width ``w`` stride ``s`` in length ``T``."""
    usable = T - offset - w
    if usable < 0:
        return 0
    return usable // s + 1


def windows(x: Array, w: int, s: int, offset: int = 0) -> Array:
    """Return sliding windows of ``x`` along the last axis.

    :param x: array ``(..., T)`` (any dtype, numpy or JAX)
    :param w: window width
    :param s: stride between window starts
    :param offset: index of the first window start
    :return: array ``(..., n_windows, w)``
    """
    T = x.shape[-1]
    n = n_windows(T, w, s, offset)
    if n <= 0:
        raise ValueError(f"no complete window: T={T}, w={w}, s={s}, offset={offset}")

    if isinstance(x, np.ndarray):
        itemsize = x.strides[-1]
        shape = x.shape[:-1] + (n, w)
        strides = x.strides[:-1] + (s * itemsize, itemsize)
        view = np.lib.stride_tricks.as_strided(
            x[..., offset:], shape=shape, strides=strides, writeable=False
        )
        return view.copy()

    import jax.numpy as jnp

    starts = offset + s * jnp.arange(n)
    idx = starts[:, None] + jnp.arange(w)[None, :]  # (n, w)
    return x[..., idx]
