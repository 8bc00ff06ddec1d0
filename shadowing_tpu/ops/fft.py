"""Matmul (MXU) FFT: the four-step Cooley-Tukey factorisation.

XLA's native TPU FFT is a scalar/vector-unit codepath; on this device it
leaves the MXU idle while the generation hot loop (scattering statistics,
``models/scattering/moments.py``) is FFT-bound. The four-step factorisation
(Bailey 1989) turns a length-``N = N1*N2`` DFT into two batched DFT
*matmuls* (N1 x N1 and N2 x N2 dense DFT matrices) with a twiddle multiply
between them:

    view x as A[n2, n1]  (n = n1 * N2 + n2)
    B = DFT_N1 @ A             (contract n1: partial transforms)
    B[k1, n2] *= exp(-2 pi i k1 n2 / N)
    C[k1, k2] = B @ DFT_N2     (contract n2)
    X[k1 + N1 * k2] = C[k1, k2]

Cost: ``N * (N1 + N2)`` complex MACs per transform — for N=4096 split
64 x 64 that is 8x the FLOPs of radix-2, but they are dense 64/128-wide
matmuls the MXU executes at TFLOP rates, vs the scalar butterfly network.
Complex arithmetic is carried as separate real/imag planes (4 real matmuls
per stage), so inputs stay f32 and the contraction rides the MXU with
``precision=HIGH``.

All ops are linear jnp primitives: jit/vmap/grad compose, and the adjoint
of a DFT matmul is again a DFT matmul (autodiff stays on the MXU too).

Used by the scattering-statistics kernel; correctness is pinned against
``np.fft`` to ~1e-4 relative in f32 (tests/test_fft.py).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGH


@lru_cache(maxsize=None)
def _split(N: int) -> tuple:
    """Balanced power-of-two factorisation N1 * N2 = N, N1 >= N2."""
    if N & (N - 1):
        raise ValueError(f"matmul FFT needs a power-of-two length, got {N}")
    p = N.bit_length() - 1
    return 1 << (p - p // 2), 1 << (p // 2)


@lru_cache(maxsize=None)
def _plan(N: int):
    """(DFT_N1 re/im, DFT_N2 re/im, twiddle re/im) as numpy f32 constants."""
    N1, N2 = _split(N)
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N2)) / N)
    cast = lambda z: (z.real.astype(np.float32), z.imag.astype(np.float32))
    return cast(f1), cast(f2), cast(tw)


def _cmatmul(ar, ai, br, bi, subscripts):
    """Complex einsum on separate real/imag planes (4 real MXU matmuls)."""
    rr = jnp.einsum(subscripts, ar, br, precision=_PREC)
    ii = jnp.einsum(subscripts, ai, bi, precision=_PREC)
    ri = jnp.einsum(subscripts, ar, bi, precision=_PREC)
    ir = jnp.einsum(subscripts, ai, br, precision=_PREC)
    return rr - ii, ri + ir


def _fft_mm_planes(xr, xi, N):
    """Four-step DFT of the last axis; input/output are real/imag planes."""
    N1, N2 = _split(N)
    (f1r, f1i), (f2r, f2i), (twr, twi) = _plan(N)
    shp = xr.shape[:-1]
    # n = n1 * N2 + n2  ->  A[..., n1, n2]; contract n1 with DFT_N1
    ar = xr.reshape(*shp, N1, N2)
    ai = xi.reshape(*shp, N1, N2) if xi is not None else None
    if ai is None:  # real input: 2 matmuls instead of 4
        br = jnp.einsum("kn,...nm->...km", jnp.asarray(f1r), ar,
                        precision=_PREC)
        bi = jnp.einsum("kn,...nm->...km", jnp.asarray(f1i), ar,
                        precision=_PREC)
    else:
        br, bi = _cmatmul(
            jnp.asarray(f1r), jnp.asarray(f1i), ar, ai, "kn,...nm->...km"
        )
    # twiddle W_N^(k1 n2), elementwise over the (N1, N2) grid
    tr, ti = jnp.asarray(twr), jnp.asarray(twi)
    br, bi = br * tr - bi * ti, br * ti + bi * tr
    # contract n2 with DFT_N2; X[k1 + N1 * k2] = C[..., k1, k2], so the
    # readout transposes to [..., k2, k1] before flattening
    cr, ci = _cmatmul(br, bi, jnp.asarray(f2r), jnp.asarray(f2i),
                      "...km,mj->...kj")
    cr = jnp.swapaxes(cr, -1, -2).reshape(*shp, N)
    ci = jnp.swapaxes(ci, -1, -2).reshape(*shp, N)
    return cr, ci


@partial(jax.jit, static_argnames=())
def fft_mm(x: jax.Array) -> jax.Array:
    """DFT of the last axis via MXU matmuls; complex64 in/out, any batch."""
    N = x.shape[-1]
    if jnp.iscomplexobj(x):
        r, i = _fft_mm_planes(jnp.real(x), jnp.imag(x), N)
    else:
        r, i = _fft_mm_planes(x, None, N)
    return jax.lax.complex(r, i)


@jax.jit
def ifft_mm(x: jax.Array) -> jax.Array:
    """Inverse DFT of the last axis: conj(fft(conj(x))) / N on the MXU."""
    N = x.shape[-1]
    r, i = _fft_mm_planes(jnp.real(x), -jnp.imag(x), N)
    return jax.lax.complex(r, -i) / N


@jax.jit
def rfft_mm(x: jax.Array) -> jax.Array:
    """Real-input DFT, non-negative half spectrum (``N // 2 + 1`` bins).

    The first-stage matmul drops to 2 real contractions (imag plane is
    zero); the half-spectrum slice happens after the full transform — the
    matmul cost is already paid, slicing is free at trace time.
    """
    N = x.shape[-1]
    r, i = _fft_mm_planes(x, None, N)
    return jax.lax.complex(r, i)[..., : N // 2 + 1]
