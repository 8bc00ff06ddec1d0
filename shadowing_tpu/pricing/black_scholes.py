"""Black-Scholes pricing and implied volatility (vectorised, jittable).

Used to invert Hedged-Monte-Carlo prices into implied-volatility smiles and
as the analytic oracle in tests (GBM paths must produce a flat smile at the
true volatility).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _norm_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0)))


def bs_call_price(spot, strike, tau, sigma, r=0.0):
    """Black-Scholes European call. ``tau`` in years, ``sigma`` annualised."""
    spot, strike, tau, sigma = map(jnp.asarray, (spot, strike, tau, sigma))
    sig_sqrt = jnp.maximum(sigma, 1e-12) * jnp.sqrt(jnp.maximum(tau, 1e-12))
    d1 = (jnp.log(spot / strike) + (r + 0.5 * sigma**2) * tau) / sig_sqrt
    d2 = d1 - sig_sqrt
    return spot * _norm_cdf(d1) - strike * jnp.exp(-r * tau) * _norm_cdf(d2)


SIGMA_LO = 1e-4
SIGMA_HI = 5.0


@partial(jax.jit, static_argnames=("n_iter",))
def bs_implied_vol(price, spot, strike, tau, r=0.0, n_iter: int = 80):
    """Implied volatility by bisection (robust, fully vectorised).

    Prices outside the solvable bracket — below the ``SIGMA_LO`` price
    (a Monte Carlo estimate can land under intrinsic value) or above the
    ``SIGMA_HI`` price — return NaN rather than a silently railed bound.
    """
    price, spot, strike, tau = map(jnp.asarray, (price, spot, strike, tau))
    shape = jnp.broadcast_shapes(price.shape, spot.shape, strike.shape,
                                 tau.shape)
    lo = jnp.full(shape, SIGMA_LO)
    hi = jnp.full(shape, SIGMA_HI)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        too_low = bs_call_price(spot, strike, tau, mid, r) < price
        return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    # f32 guard band: boundary prices must stay solvable despite rounding
    # skew between the caller's price and the in-graph bracket evaluation
    tol = 1e-6 * spot
    valid = (price >= bs_call_price(spot, strike, tau, SIGMA_LO, r) - tol) & (
        price <= bs_call_price(spot, strike, tau, SIGMA_HI, r) + tol
    )
    return jnp.where(valid, 0.5 * (lo + hi), jnp.nan)
