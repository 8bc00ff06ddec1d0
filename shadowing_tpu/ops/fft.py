"""Matmul (MXU) FFT: the four-step Cooley-Tukey factorisation.

XLA's native TPU FFT is a vector-unit codepath (measured 1.6 ms for a
(256*9, 4096) complex transform on this chip); the generation hot loop
(scattering statistics, ``models/scattering/moments.py``) is FFT-bound
after the Gram fusion. The four-step factorisation (Bailey 1989) turns a
length-``N = N1*N2`` DFT into two dense matmul stages the MXU executes:

    view x as A[n1, n2]  (n = n1 * N2 + n2)
    B[k1, n2] = sum_n1 A[n1, n2] W_N1^(n1 k1)        (stage 1, contract n1)
    C[k1, k2] = sum_n2 B[k1, n2] W_N^(k1 n2) W_N2^(n2 k2)   (stage 2)
    X[k1 + N1 * k2] = C[k1, k2]

Design choices that make it fast here:

* complex arithmetic is ONE real einsum per stage: real/imag planes are a
  length-2 axis contracted against a [[r, i], [-i, r]] block-structured
  DFT tensor, so each stage is a single 128-wide MXU contraction and one
  pass of HBM traffic (v1 with four separate real einsums ran at XLA-FFT
  speed; this form beats it ~3x on the hot shape).
* the twiddle ``W_N^(k1 n2)`` is folded into a per-``k1`` batch of stage-2
  matrices — no standalone elementwise twiddle pass.
* the output permutation ``[k1, k2] -> k1 + N1 k2`` is emitted directly by
  the stage-2 einsum's output spec (a matmul epilogue, not a copy).
* band-limited structure is exploited where the caller declares it:
  ``rfft_mm`` keeps only non-negative bins (half the stage-2 columns);
  ``ifft_analytic_mm`` takes a half spectrum whose negative bins are zero
  (half the stage-1 rows) — exactly the two transforms the scattering
  statistics need at (B, J, T) scale.

Stages contract with ``precision=HIGH`` (bf16x3 passes, ~1e-6 relative
— plenty for the statistics these DFTs feed, at half the MXU time of
HIGHEST; parity vs np.fft is pinned by tests at 2e-4). All ops are jnp
einsums: jit/vmap/grad compose, and adjoints are again DFT matmuls.

Correctness is pinned against ``np.fft`` (tests/test_fft.py), including
gradients and the analytic-half-spectrum path.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGH


@lru_cache(maxsize=None)
def _split(N: int) -> tuple:
    """Balanced power-of-two factorisation N1 * N2 = N, N1 >= N2."""
    if N <= 1 or N & (N - 1):
        raise ValueError(f"matmul FFT needs a power-of-two length >= 2, got {N}")
    p = N.bit_length() - 1
    return 1 << (p - p // 2), 1 << (p // 2)


def _block1(F: np.ndarray) -> np.ndarray:
    """Stage-1 block tensor ``T[p, n, q, k]`` for complex y = x @ F:
    yr = xr Fr - xi Fi, yi = xr Fi + xi Fr (p: in plane, q: out plane)."""
    out = np.empty((2,) + F.shape[:1] + (2,) + F.shape[1:], np.float32)
    out[0, :, 0] = F.real
    out[1, :, 0] = -F.imag
    out[0, :, 1] = F.imag
    out[1, :, 1] = F.real
    return out


def _block2(M: np.ndarray) -> np.ndarray:
    """Stage-2 block tensor ``T[k, q, m, r, j]`` from per-k matrices
    ``M[k, m, j]`` (q: in plane, r: out plane)."""
    k, m, j = M.shape
    out = np.empty((k, 2, m, 2, j), np.float32)
    out[:, 0, :, 0] = M.real
    out[:, 1, :, 0] = -M.imag
    out[:, 0, :, 1] = M.imag
    out[:, 1, :, 1] = M.real
    return out


@lru_cache(maxsize=None)
def _plan(N: int, n1_rows: int, n_bins: int) -> tuple:
    """(stage-1 block, stage-2 block, N1, N2) for a length-N DFT that reads
    only input rows ``n1 < n1_rows`` (rest known zero) and emits only flat
    bins ``k < n_bins`` (callers slice the k2 axis)."""
    N1, N2 = _split(N)
    n = np.arange(N1)[:n1_rows, None] * np.arange(N1)[None, :]
    f1 = np.exp(-2j * np.pi * n / N1)                   # (n1_rows, N1)
    k2_cols = min(N2, -(-n_bins // N1))                 # k = k1 + N1 k2
    m = np.arange(N2)
    f2 = np.exp(-2j * np.pi * np.outer(m, m[:k2_cols]) / N2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(N1), m) / N)
    M2 = tw[:, :, None] * f2[None]                      # (N1, N2, k2_cols)
    return _block1(f1), _block2(M2), N1, N2


def _dft_planes(xr, xi, N, n1_rows=None, n_bins=None):
    """Forward DFT of the last axis on real/imag planes; returns planes of
    length ``n_bins`` (default N). ``xi=None`` for real input."""
    n_bins = N if n_bins is None else n_bins
    F1, M2, N1, N2 = _plan(N, N1r := (n1_rows or _split(N)[0]), n_bins)
    shp = xr.shape[:-1]
    ar = xr.reshape(*shp, -1, N2)[..., :N1r, :]
    if xi is None:
        b = jnp.einsum("...nm,nqk->...qkm", ar, jnp.asarray(F1[0]),
                       precision=_PREC)
    else:
        ai = xi.reshape(*shp, -1, N2)[..., :N1r, :]
        a = jnp.stack([ar, ai], axis=-3)                # (..., p, n1, N2)
        b = jnp.einsum("...pnm,pnqk->...qkm", a, jnp.asarray(F1),
                       precision=_PREC)
    # stage 2 batched over k1; output spec emits the k1 + N1*k2 order
    c = jnp.einsum("...qkm,kqmrj->...rjk", b, jnp.asarray(M2),
                   precision=_PREC)
    c = c.reshape(*shp, 2, -1)[..., :n_bins]
    return c[..., 0, :], c[..., 1, :]


def fft_mm(x: jax.Array) -> jax.Array:
    """DFT of the last axis via MXU matmuls; any batch shape."""
    N = x.shape[-1]
    if jnp.iscomplexobj(x):
        r, i = _dft_planes(jnp.real(x), jnp.imag(x), N)
    else:
        r, i = _dft_planes(x, None, N)
    return jax.lax.complex(r, i)


def ifft_mm(x: jax.Array) -> jax.Array:
    """Inverse DFT of the last axis: conj(fft(conj(x))) / N."""
    N = x.shape[-1]
    r, i = _dft_planes(jnp.real(x), -jnp.imag(x), N)
    return jax.lax.complex(r, -i) / N


def rfft_mm(x: jax.Array) -> jax.Array:
    """Real-input DFT, non-negative bins only (``N // 2 + 1``).

    Real input halves stage 1 (one plane); the half spectrum drops nearly
    half of stage 2's columns.
    """
    N = x.shape[-1]
    r, i = _dft_planes(x, None, N, n_bins=N // 2 + 1)
    return jax.lax.complex(r, i)


def rfft_mm_planes(x: jax.Array):
    """:func:`rfft_mm` returning separate (real, imag) f32 planes — lets
    plane-native callers (the scattering statistics) skip every complex64
    pack/unpack pass."""
    N = x.shape[-1]
    return _dft_planes(x, None, N, n_bins=N // 2 + 1)


def ifft_analytic_mm_planes(spec_r: jax.Array, spec_i: jax.Array, N: int):
    """:func:`ifft_analytic_mm` on (real, imag) half-spectrum planes,
    returning the analytic signal as (real, imag) planes."""
    half = N // 2 + 1
    if spec_r.shape[-1] != half:
        raise ValueError(
            f"expected {half} non-negative bins for N={N}, "
            f"got {spec_r.shape[-1]}"
        )
    N1, N2 = _split(N)
    n1_rows = -(-half // N2)
    padw = [(0, 0)] * (spec_r.ndim - 1) + [(0, n1_rows * N2 - half)]
    r, i = _dft_planes(jnp.pad(spec_r, padw), jnp.pad(-spec_i, padw),
                       N, n1_rows=n1_rows)
    return r / N, -i / N


def ifft_analytic_mm(spec_half: jax.Array, N: int) -> jax.Array:
    """Length-``N`` inverse DFT of an *analytic* spectrum given as its
    ``N // 2 + 1`` non-negative bins (bins above N/2 are zero — e.g. a
    signal filtered by an analytic wavelet). The known-zero rows drop
    nearly half of stage 1. Returns the complex analytic signal.

    Equivalent to ``jnp.fft.ifft(pad(spec_half to N))`` (tested).
    """
    half = N // 2 + 1
    if spec_half.shape[-1] != half:
        raise ValueError(
            f"expected {half} non-negative bins for N={N}, "
            f"got {spec_half.shape[-1]}"
        )
    N1, N2 = _split(N)
    n1_rows = -(-half // N2)  # zero-pad only up to the last touched row
    pad = n1_rows * N2 - half
    xr = jnp.pad(jnp.real(spec_half), [(0, 0)] * (spec_half.ndim - 1) + [(0, pad)])
    xi = jnp.pad(-jnp.imag(spec_half), [(0, 0)] * (spec_half.ndim - 1) + [(0, pad)])
    r, i = _dft_planes(xr, xi, N, n1_rows=n1_rows)
    return jax.lax.complex(r, -i) / N
