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
from typing import Tuple

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
        # sum of per-seed means: gradients don't depend on the batch split
        return ((stats - target[None]) ** 2).mean(axis=-1).sum(), stats

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
    checkpoint_path=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Synthesise ``batch`` series matching ``target`` statistics.

    Returns (normalised series ``(batch, T)``, per-seed RMS losses).
    The caller rescales by the target std / adds the target mean.

    :param checkpoint_path: optional ``.npz`` file; the optimiser state
        (series, Adam moments, step count) is saved there after every
        segment, so an interrupted long generation resumes mid-shard.
    """
    T = bank.T
    psi = jnp.asarray(bank.psi_hat)
    z = jax.random.normal(key, (batch, T), jnp.float32)
    m = jnp.zeros_like(z)
    v = jnp.zeros_like(z)

    done = 0
    if checkpoint_path is not None and checkpoint_path.exists():
        ckpt = np.load(checkpoint_path)
        if ckpt["z"].shape == (batch, T) and int(ckpt["done"]) <= max_iterations:
            z = jnp.asarray(ckpt["z"])
            m = jnp.asarray(ckpt["m"])
            v = jnp.asarray(ckpt["v"])
            done = int(ckpt["done"])
            if verbose:
                print(f"  resumed synthesis from step {done}", flush=True)

    losses = None
    while done < max_iterations:
        n = min(segment, max_iterations - done)
        z, m, v, losses = _optimize_segment(
            z, m, v, jnp.asarray(done, jnp.float32), target, psi,
            J=bank.J, n_steps=n, lr=lr,
        )
        done += n
        rms = np.sqrt(np.asarray(losses))
        if checkpoint_path is not None:
            tmp = checkpoint_path.with_suffix(".tmp.npz")
            np.savez(tmp, z=np.asarray(z), m=np.asarray(m), v=np.asarray(v),
                     done=done)
            tmp.replace(checkpoint_path)
        if verbose:
            print(
                f"  synthesis step {done:5d}: rms mismatch "
                f"median={np.median(rms):.4f} max={rms.max():.4f}",
                flush=True,
            )
        if (rms < tol).all():
            break
    if losses is None:  # resumed exactly at the step budget: evaluate only
        z, m, v, losses = _optimize_segment(
            z, m, v, jnp.asarray(done, jnp.float32), target, psi,
            J=bank.J, n_steps=0, lr=lr,
        )
    if checkpoint_path is not None and checkpoint_path.exists():
        checkpoint_path.unlink()  # shard finished: drop the mid-shard state
    return np.asarray(z), np.sqrt(np.asarray(losses))
