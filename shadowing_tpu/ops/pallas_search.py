"""Pallas TPU kernel: fused shadow scoring + block-min tournament pass.

The XLA fused path materialises the segment gather and the score tensor in
HBM (~3 full-array round trips). This kernel fuses the whole pass-1 of the
search in VMEM: stream whole trajectory-row tiles HBM -> VMEM once, run the
banded-Toeplitz filter matmul on the MXU for every 128-window block
(statically unrolled), subtract from the cached window norms, and write only
the per-block minima back to HBM — ~L times less traffic than the scores.

Pass 2 (XLA, tiny) selects the ``cap`` best blocks globally, *recomputes*
their scores from the raw data at full precision, runs an exact top-k over
the ``cap * L`` candidates and certifies the result with the tournament
bound (see :mod:`shadowing_tpu.ops.topk`) including a guard band for the
pass-1/pass-2 rounding skew.

VMEM budget: a grid step holds a trajectory-row tile plus a same-size norms
tile, each double-buffered by the pipeline; the row count is sized to keep
the total under the 16 MB VMEM.
(Mosaic rejects dynamic lane-indexed stores, so the per-block minima are
assembled in registers across the static unroll and stored once.)
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from shadowing_tpu.ops.sliding import _toeplitz as _toeplitz_generic

L = 128               # window starts per block (= the tournament block size)
#: target bytes for the trajectory tile per grid step; the pipeline holds
#: two double-buffered input tiles of roughly this size, so keep the total
#: well under the 16 MB VMEM
_VMEM_TILE = 3 << 19


def _rows_per_tile(t_cols: int) -> int:
    tr = _VMEM_TILE // (t_cols * 4)
    return max(8, min(256, (tr // 8) * 8))


def _toeplitz_2l(g: jax.Array) -> jax.Array:
    """Banded Toeplitz ``(2L, L)`` operator of a filter ``g`` (w <= L + 1):
    ``G[s, l] = g[s - l]`` for ``0 <= s - l < w`` — the generic builder from
    :mod:`shadowing_tpu.ops.sliding`, zero-padded from ``L + w - 1`` to
    ``2L`` rows (the kernel always consumes two L-blocks per segment)."""
    G = _toeplitz_generic(g[None, None, :], L)[0, :, :, 0]   # (L + w - 1, L)
    return jnp.pad(G, ((0, 2 * L - G.shape[0]), (0, 0)))


def _make_kernel(nblk: int):
    def kernel(y_ref, nrm_ref, g_ref, out_ref):
        g = g_ref[0]                                     # (2L, L)
        mins = []
        for j in range(nblk):                            # static unroll
            seg = y_ref[0, :, j * L : (j + 2) * L]       # (TR, 2L)
            cross = jax.lax.dot_general(
                seg, g,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                            # (TR, L)
            s = nrm_ref[0, :, j * L : (j + 1) * L] - 2.0 * cross
            mins.append(s.min(axis=1))
        out_ref[0] = jnp.stack(mins, axis=1)             # (TR, nblk)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def score_blockmin(
    y2: jax.Array,       # (R, (nblk + 1) * L) padded trajectories
    norms2: jax.Array,   # (R, nblk * L) window norms, +inf outside n_out
    g: jax.Array,        # (B, w) combined context filters (w <= L + 1)
    interpret: bool = False,
) -> jax.Array:          # (B, R, nblk) block minima of the scores
    R, t_cols = y2.shape
    nblk = norms2.shape[1] // L
    B = g.shape[0]
    G = jax.vmap(_toeplitz_2l)(g)                        # (B, 2L, L)
    tr = _rows_per_tile(t_cols)

    grid = (B, R // tr)
    return pl.pallas_call(
        _make_kernel(nblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, t_cols), lambda b, i: (0, i, 0)),
            pl.BlockSpec((1, tr, nblk * L), lambda b, i: (0, i, 0)),
            pl.BlockSpec((1, 2 * L, L), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tr, nblk), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R, nblk), jnp.float32),
        interpret=interpret,
    )(y2[None], norms2[None], G)


@partial(jax.jit, static_argnames=("n_out",))
def _pad_views(
    y: jax.Array,        # (R, 1, T) single-channel trajectories
    norms: jax.Array,    # (R, n_out)
    n_out: int,
) -> Tuple[jax.Array, jax.Array]:
    """(R', (nblk + 1) * L) trajectory matrix and +inf-padded norms, row
    count padded to the grid tile."""
    R, C, T = y.shape
    if C != 1:
        raise ValueError("pallas search supports single-channel datasets")
    nblk = -(-n_out // L)
    t_need = (nblk + 1) * L
    tr = _rows_per_tile(t_need)
    r_pad = (-R) % tr
    y2 = jnp.pad(y[:, 0, :], ((0, r_pad), (0, max(0, t_need - T))))
    y2 = y2[:, :t_need]
    n2 = jnp.pad(
        norms,
        ((0, r_pad), (0, nblk * L - n_out)),
        constant_values=jnp.inf,
    )
    return y2, n2


@partial(jax.jit, static_argnames=("k", "n_out", "cap", "interpret"))
def two_pass_search(
    y: jax.Array,        # (R, 1, T)
    norms: jax.Array,    # (R, n_out)
    g: jax.Array,        # (B, 1, w) combined filters, w <= L + 1
    k: int,
    n_out: int,
    cap: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact k-smallest scores over all (trajectory, window) pairs.

    Returns (scores (B, k) ascending, flat indices (B, k) = traj * n_out + t,
    ok (B,) certification flags).
    """
    B, _, w = g.shape
    if w > L + 1:
        raise ValueError(f"filter width {w} > {L + 1} unsupported by the "
                         "pallas search; use the scan path")
    y2, n2 = _pad_views(y, norms, n_out)
    Rp = y2.shape[0]
    nblk = n2.shape[1] // L

    # ---- pass 1: fused score + block minima (Pallas) -------------------
    bmin = score_blockmin(y2, n2, g[:, 0, :], interpret=interpret)
    bmin_flat = bmin.reshape(B, Rp * nblk)   # flat block id = r * nblk + j

    if cap is None:
        # worst case every winner sits in its own block: cap must exceed k
        # blocks or the certification fails on spread-out score fields
        cap = min(max(k + k // 4 + 256, 512), Rp * nblk)
    cap = min(max(cap, -(-k // L)), Rp * nblk)

    # ---- pass 2: global block selection + exact rescore (XLA) ----------
    G = jax.vmap(_toeplitz_2l)(g[:, 0, :])               # (B, 2L, L)

    def per_context(bmin_b, G_b):
        neg_mu, bidx = jax.lax.top_k(-bmin_b, cap)       # cap best blocks
        mu_cap = jnp.where(cap < Rp * nblk, -neg_mu[-1], jnp.inf)
        bidx = jnp.sort(bidx)  # flat order: exact ties match the sort oracle
        r = bidx // nblk
        j = bidx % nblk
        col = j[:, None] * L + jnp.arange(2 * L)[None, :]
        seg = y2[r[:, None], col]                        # (cap, 2L)
        cross = jnp.einsum("cs,sl->cl", seg, G_b,
                           precision=jax.lax.Precision.HIGHEST)
        ncol = j[:, None] * L + jnp.arange(L)[None, :]
        s = n2[r[:, None], ncol] - 2.0 * cross           # (cap, L)
        flat_idx = (r * nblk + j)[:, None] * L + jnp.arange(L)[None, :]
        neg_v, loc = jax.lax.top_k(-s.reshape(-1), k)
        vals = -neg_v
        idx = flat_idx.reshape(-1)[loc]
        # certification with a guard band for pass-1/pass-2 rounding skew
        guard = 1e-5 * jnp.abs(mu_cap) + 1e-12
        ok = jnp.where(jnp.isinf(mu_cap), True, vals[-1] + guard < mu_cap)
        return vals, idx, ok

    vals, idx, ok = jax.vmap(per_context)(bmin_flat, G)
    # padded-block flat ids -> true (traj * n_out + t) ids
    traj = idx // (nblk * L)
    t = idx % (nblk * L)
    return vals, (traj * n_out + t).astype(jnp.int32), ok
