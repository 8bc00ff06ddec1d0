"""Context-factored shadow search: precomputed embedding responses + a
tiny dense per-context contraction (Pallas pass-1 variant).

The banded-Toeplitz pass-1 kernel (:mod:`shadowing_tpu.ops.pallas_search`)
contracts ``ceil((L + w - 1) / L) * L`` samples per window score — for a
w=20 filter that is 256 MACs where 20 are intrinsic, and the cost repeats
for EVERY context. But the combined context filter is linear in the
embedding: ``g_b = sum_d x_emb[b, d] * kernel_d``, so

    cross_b = y * g_b = sum_d x_emb[b, d] * (y * kernel_d) = x_emb[b] @ E

where ``E[r, d, t] = (y * kernel_d)[r, t]`` is context-INDEPENDENT. This
module precomputes ``E`` once per (dataset, embedding plan) and reduces
pass-1 of every subsequent search to a dense ``(B, d)``-by-``E`` matmul
streamed tile-by-tile with the per-block minima folded in VMEM — the MXU
work per context drops from ``2L`` contracted samples to one K-tile
(``3 * d`` packed rows), a measured ~3x at the backtest config (B=64
contexts, w=20), growing with B.

Precision: ``E`` is built at HIGH (3-pass f32) and stored as a hi/lo bf16
pair (``E = Eh + El`` up to ~2^-18 relative). The in-kernel contraction
computes ``xh@Eh + xl@Eh + xh@El`` with native-bf16 dots — the same error
class as the Toeplitz kernel's bf16x3 scheme, so pass-2's certification
guard (1e-5) applies unchanged. The three products ride TWO K-tile-1 dots
by packing rows: ``[xh, xh] @ [Eh; El] + [xl, 0] @ [Eh; El]`` (the zero
half costs MACs the MXU had idle anyway at K <= 128, and keeps both dots
full-K — no sublane-offset slicing of the E block).

Layout (the whole point — every step stays relayout-free on Mosaic):

* ``E9`` is ``(NT, nblk, 2 * dp, L * TR)`` bf16 — grid-step ``(i, j)``
  reads one ``(2 * dp, L * TR)`` 2-D block, rows ``[Eh(dp); El(dp)]``
  (``dp`` = d padded to a multiple of 4: only the STACKED ``2 * dp`` axis
  is a Mosaic block dim, so it, not dp itself, must hit the 8-sublane
  grain — d=20 stores 40 rows, not 48, saving ~17% of E9's HBM),
  columns ordered ``(l, r)`` with the trajectory-row ``r`` minor.
* the dot output ``cross (B, L * TR)`` then folds to per-row minima by 7
  CONTIGUOUS half-splits of the lane axis (l-major order makes every
  split tile-aligned) — no lane-strided reduce, no transpose.
* block minima land as ``(B, nblk, Rp)`` (j-major flat ids); pass 2 is
  shared with the Toeplitz kernel
  (:func:`shadowing_tpu.ops.pallas_search._pass2_from_bmin`), which selects
  on j-major ids and converts only the ``cap`` selected ids to r-major
  before the canonical-order sort — the candidate order (hence the
  (distance, flat id) tie order) is identical across kernels.

Reference parity: this is an alternative exact implementation of
``batched_distance`` + top-k selection
(``/root/reference/shadowing/path_shadowing/path_shadowing.py:147-173``);
selection results are certified-or-redone exactly like every other method.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from shadowing_tpu.ops import pallas_search as ps
from shadowing_tpu.ops.sliding import sliding_dot

L = ps.L
TR = 128          # trajectory rows per tile (lane dim of the folded minima)
#: max embedding dimension: [xh, xh] packs 2 * dp rows into one K tile
MAX_DIM = 48


def _dpad(d: int) -> int:
    """d padded so the stacked [Eh; El] sublane axis (2 * dp) is a multiple
    of 8 — i.e. dp is a multiple of 4, not 8 (saves 4 E9 rows at d=20)."""
    return -(-d // 4) * 4


def e9_bytes(R: int, n_out: int, d: int) -> int:
    """HBM bytes of the factored representation (bf16 hi/lo pair)."""
    rp = -(-R // TR) * TR
    nblk = -(-n_out // L)
    return rp * nblk * L * 2 * _dpad(d) * 2


@jax.jit
def build_factored(
    y3: jax.Array,       # (Rp, C, cols) pallas pad view (rows % TR == 0)
    n2: jax.Array,       # (Rp, nblk * L) +inf-padded window norms
    kernel: jax.Array,   # (d, C, w) embedding bank (the engine's plan kernel)
) -> Tuple[jax.Array, jax.Array]:
    """Embedding responses in the kernel-ready blocked layout.

    Returns ``E9 (NT, nblk, 2 * dp, L * TR)`` bf16 (rows ``[Eh; El]``,
    cols ``(l, r)``) and ``n4 (NT, nblk, L * TR)`` f32 norms in the same
    column order.
    """
    Rp, C, cols = y3.shape
    d, _, w = kernel.shape
    nblk = n2.shape[1] // L
    dp = _dpad(d)
    if Rp % TR:
        raise ValueError(f"rows {Rp} must be padded to multiples of {TR}")
    NT = Rp // TR
    kp = jnp.pad(kernel, ((0, dp - d), (0, 0), (0, 0)))

    def per_tile(y_t):                                   # (TR, C, cols)
        # HIGH matches the Toeplitz kernel's selection error class; the
        # hi/lo split below keeps ~2^-18 of it
        e = sliding_dot(y_t, kp, n_out=nblk * L,
                        precision=jax.lax.Precision.HIGH)   # (TR, dp, nblk*L)
        e = e.reshape(TR, dp, nblk, L).transpose(2, 1, 3, 0)  # (nblk,dp,L,TR)
        hi = e.astype(jnp.bfloat16)
        lo = (e - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=1).reshape(nblk, 2 * dp, L * TR)

    E9 = jax.lax.map(per_tile, y3.reshape(NT, TR, C, cols))
    # 4-D with a singleton sublane dim: Mosaic requires the last two BLOCK
    # dims to be (8k, 128m)-divisible or full — (1, N) blocks of a 3-D
    # (NT, nblk, N) array would put block-size 1 against array dim nblk
    n4 = (
        n2.reshape(NT, TR, nblk, L)
        .transpose(0, 2, 3, 1)
        .reshape(NT, nblk, 1, L * TR)
    )
    return E9, n4


def _make_kernel():
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    def kernel(e_ref, n_ref, xhh_ref, xlz_ref, out_ref):
        e = e_ref[0, 0]                                  # (2*dp, L*TR) bf16
        # xh@Eh + xh@El (one packed dot) + xl@Eh ([xl, 0] against the same
        # block: both dots full-K, no sublane-offset slice of e)
        cross = dot(xhh_ref[...], e) + dot(xlz_ref[...], e)
        s = n_ref[0, 0] - 2.0 * cross                    # (B, L*TR)
        h = L // 2
        while h:                                         # l-major half folds
            s = jnp.minimum(s[:, : h * TR], s[:, h * TR : 2 * h * TR])
            h //= 2
        out_ref[0] = s                                   # (B, TR)

    return kernel


#: contexts per kernel call — the VMEM cross/score buffer is (B, L * TR) f32
_B_KERNEL = 128


@partial(jax.jit, static_argnames=("interpret",))
def score_blockmin_factored(
    E9: jax.Array,       # (NT, nblk, 2 * dp, L * TR) bf16
    n4: jax.Array,       # (NT, nblk, 1, L * TR) f32
    x_emb: jax.Array,    # (B, d) f32 context embeddings
    interpret: bool = False,
) -> jax.Array:          # (B, nblk, Rp) block minima, j-major layout
    NT, nblk, dd, N = E9.shape
    dp = dd // 2
    B, d = x_emb.shape
    bpad = (-B) % 8          # sublane-align the context axis (out blocks)
    xp = jnp.pad(x_emb, ((0, bpad), (0, dp - d)))
    xh = xp.astype(jnp.bfloat16)
    xl = (xp - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    xhh = jnp.concatenate([xh, xh], axis=1)              # (B, 2*dp)
    xlz = jnp.concatenate([xl, jnp.zeros_like(xl)], axis=1)

    def run(xhh_c, xlz_c):
        # output is (nblk, Bc, Rp): a (1, Bc, TR) block keeps the last two
        # BLOCK dims (Bc div 8, TR = 128) Mosaic-legal
        Bc = xhh_c.shape[0]
        return pl.pallas_call(
            _make_kernel(),
            grid=(NT, nblk),
            in_specs=[
                pl.BlockSpec((1, 1, 2 * dp, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((Bc, 2 * dp), lambda i, j: (0, 0)),
                pl.BlockSpec((Bc, 2 * dp), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Bc, TR), lambda i, j: (j, 0, i)),
            out_shape=jax.ShapeDtypeStruct((nblk, Bc, NT * TR), jnp.float32),
            interpret=interpret,
        )(E9, n4, xhh_c, xlz_c)

    parts = [
        run(xhh[b0 : b0 + _B_KERNEL], xlz[b0 : b0 + _B_KERNEL])
        for b0 in range(0, B + bpad, _B_KERNEL)
    ]
    bmin = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    # kept j-major: pass 2 selects on flat id j * Rp + r and converts the
    # cap selected ids afterwards — transposing the whole minima tensor
    # here would cost ~2 extra passes over it
    return bmin.transpose(1, 0, 2)[:B]                   # (B, nblk, Rp)


@partial(jax.jit, static_argnames=("k", "n_out", "cap", "interpret"))
def two_pass_search_factored(
    E9: jax.Array,
    n4: jax.Array,
    y3: jax.Array,
    n2: jax.Array,
    g: jax.Array,        # (B, C, w) combined filters (pass-2 exact rescore)
    x_emb: jax.Array,    # (B, d) context embeddings (pass-1 contraction)
    k: int,
    n_out: int,
    cap: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Factored-E twin of :func:`~shadowing_tpu.ops.pallas_search.
    two_pass_search_padded`: same return contract (scores ascending, flat
    ``traj * n_out + t`` indices, per-context certification flags)."""
    Rp = y3.shape[0]
    nblk = n2.shape[1] // L
    if Rp * nblk * L >= jnp.iinfo(jnp.int32).max:
        raise ValueError(
            f"padded flat id space Rp * nblk * L = {Rp} * {nblk} * {L} "
            "exceeds int32 — split the trajectory axis (see "
            "shadowing_tpu.shadow.engine.shadow_sharded_rows)"
        )
    bmin = score_blockmin_factored(E9, n4, x_emb, interpret=interpret)
    bmin_flat = bmin.reshape(x_emb.shape[0], Rp * nblk)   # id = j * Rp + r
    return ps._pass2_from_bmin(bmin_flat, y3, n2, g, k=k, n_out=n_out,
                               cap=cap, block_id_order="jr")
