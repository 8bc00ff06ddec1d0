"""Realized variance / volatility statistics.

Rebuilds the reference's prediction statistics
(``/root/reference/shadowing/statistics.py:5-17`` and
``shadowing/PDV/PDV.py:21-27``) in JAX: mean squared log-return over the
first ``T`` out-context steps, annualised by the trading-day count
(``ANNUALIZATION = 252``).
"""
from __future__ import annotations

from typing import Iterable

import jax.numpy as jnp
import numpy as np

from shadowing_tpu.array_types import Array

ANNUALIZATION = 252


def realized_variance(x: Array, Ts: Iterable[int], vol: bool = False) -> Array:
    """Realized variance of log-returns ``x`` at several maturities.

    :param x: log-return array ``(..., T)``
    :param Ts: maturities (numbers of leading steps to aggregate)
    :param vol: if True return realized volatility (square root)
    :return: array ``(..., len(Ts))``
    """
    x = jnp.asarray(x)
    x2 = x**2
    rv = jnp.stack([x2[..., :T].mean(axis=-1) for T in Ts], axis=-1) * ANNUALIZATION
    return jnp.sqrt(rv) if vol else rv


def get_RV(x: Array, from_dln: bool = False) -> Array:
    """Annualised realized volatility of a price (or log-return) window.

    Mirrors the reference semantics (``PDV.py:21-27``): with prices the
    annualiser is ``(T-1)/252`` over the ``T-1`` log-return increments; with
    log-returns (``from_dln=True``) it is ``T/252``.
    """
    x = jnp.asarray(x)
    if from_dln:
        ann = x.shape[-1] / ANNUALIZATION
        return jnp.sqrt((x**2).sum(axis=-1) / ann)
    ann = (x.shape[-1] - 1) / ANNUALIZATION
    dln = jnp.diff(jnp.log(x), axis=-1)
    return jnp.sqrt((dln**2).sum(axis=-1) / ann)


def as_host(x: Array) -> np.ndarray:
    return np.asarray(x)
