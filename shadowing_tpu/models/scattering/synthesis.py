"""Gradient-based scattering-spectra synthesis (max-entropy generation).

Implements the generation scheme behind the reference's
``snp_generation.py`` (``/root/reference/scripts/snp_generation.py:39-50``):
start from white noise and gradient-descend each seed until its *own*
scattering-spectra statistics match the target vector estimated on the
observed series (the microcanonical model of arXiv:2204.10177).

TPU design: every seed is an independent optimisation of a length-T vector;
seeds are vmapped into batches and stepped together under one jitted
``lax.scan`` (Adam in normalised coordinates). The loss is the mean squared
mismatch of the ~2+2J+J(J-1)+2|triples| statistics; a seed "converges" when
its RMS mismatch falls below ``tol``. Early stopping is checked between
scan segments on the host (all-converged batches stop spending steps).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shadowing_tpu.models.scattering.moments import _scattering_stats_flat
from shadowing_tpu.models.scattering.wavelets import FilterBank


@partial(jax.jit, static_argnames=("J", "n_steps", "lr"))
def _optimize_segment(
    z: jax.Array,          # (B, T) normalised series being optimised
    m: jax.Array,          # Adam state
    v: jax.Array,
    i0: jax.Array,         # () step offset
    target: jax.Array,     # (n_stats,)
    psi_hat: jax.Array,    # (J, T)
    J: int,
    n_steps: int,
    lr: float = 0.03,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run ``n_steps`` Adam steps; returns (z, m, v, per-seed loss)."""
    b1, b2, eps = 0.9, 0.999, 1e-8

    def loss_fn(z):
        stats = _scattering_stats_flat(z, psi_hat, J=J)   # (B, n)
        return ((stats - target[None]) ** 2).mean(), stats

    def per_seed_loss(stats):
        return ((stats - target[None]) ** 2).mean(axis=-1)

    def step(carry, i):
        z, m, v = carry
        (_, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(z)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g**2
        t = (i0 + i + 1).astype(jnp.float32)
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        z = z - lr * mh / (jnp.sqrt(vh) + eps)
        return (z, m, v), None

    (z, m, v), _ = jax.lax.scan(step, (z, m, v), jnp.arange(n_steps))
    _, stats = loss_fn(z)
    return z, m, v, per_seed_loss(stats)


def synthesize_batch(
    key: jax.Array,
    target: jax.Array,
    bank: FilterBank,
    batch: int,
    max_iterations: int = 1000,
    tol: float = 1e-2,
    segment: int = 100,
    lr: float = 0.03,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Synthesise ``batch`` series matching ``target`` statistics.

    Returns (normalised series ``(batch, T)``, per-seed RMS losses).
    The caller rescales by the target std / adds the target mean.
    """
    T = bank.T
    psi = jnp.asarray(bank.psi_hat)
    z = jax.random.normal(key, (batch, T), jnp.float32)
    m = jnp.zeros_like(z)
    v = jnp.zeros_like(z)

    done = 0
    losses = None
    while done < max_iterations:
        n = min(segment, max_iterations - done)
        z, m, v, losses = _optimize_segment(
            z, m, v, jnp.asarray(done, jnp.float32), target, psi,
            J=bank.J, n_steps=n, lr=lr,
        )
        done += n
        rms = np.sqrt(np.asarray(losses))
        if verbose:
            print(
                f"  synthesis step {done:5d}: rms mismatch "
                f"median={np.median(rms):.4f} max={rms.max():.4f}",
                flush=True,
            )
        if (rms < tol).all():
            break
    return np.asarray(z), np.sqrt(np.asarray(losses))
