"""Matmul (four-step) FFT vs numpy oracles, including grad flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowing_tpu.ops.fft import fft_mm, ifft_mm, rfft_mm


@pytest.mark.parametrize("N", [8, 64, 256, 4096])
def test_fft_matches_numpy(rng, N):
    x = (rng.standard_normal((3, N)) + 1j * rng.standard_normal((3, N))).astype(
        np.complex64
    )
    got = np.asarray(fft_mm(jnp.asarray(x)))
    want = np.fft.fft(x)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)


@pytest.mark.parametrize("N", [64, 1024, 4096])
def test_real_input_and_rfft(rng, N):
    x = rng.standard_normal((2, 5, N)).astype(np.float32)
    want = np.fft.fft(x)
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(fft_mm(jnp.asarray(x))), want, atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(rfft_mm(jnp.asarray(x))), np.fft.rfft(x),
        atol=2e-4 * scale,
    )


@pytest.mark.parametrize("N", [64, 4096])
def test_ifft_roundtrip(rng, N):
    x = (rng.standard_normal((4, N)) + 1j * rng.standard_normal((4, N))).astype(
        np.complex64
    )
    got = np.asarray(ifft_mm(fft_mm(jnp.asarray(x))))
    np.testing.assert_allclose(got, x, atol=5e-4 * np.abs(x).max())


@pytest.mark.parametrize("N", [64, 4096])
def test_ifft_analytic_matches_padded_ifft(rng, N):
    """Half-spectrum analytic inverse == ifft of the zero-padded spectrum."""
    from shadowing_tpu.ops.fft import ifft_analytic_mm

    half = N // 2 + 1
    spec = (rng.standard_normal((3, half))
            + 1j * rng.standard_normal((3, half))).astype(np.complex64)
    full = np.zeros((3, N), np.complex64)
    full[:, :half] = spec
    want = np.fft.ifft(full)
    got = np.asarray(ifft_analytic_mm(jnp.asarray(spec), N))
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())
    with pytest.raises(ValueError, match="bins"):
        ifft_analytic_mm(jnp.asarray(spec[:, :-1]), N)


def test_non_power_of_two_raises():
    with pytest.raises(ValueError, match="power-of-two"):
        fft_mm(jnp.zeros(12))


def test_grad_flows_and_matches_fft_adjoint(rng):
    """d/dx of a spectral loss must agree between fft_mm and jnp.fft."""
    x = rng.standard_normal((2, 256)).astype(np.float32)

    def loss_mm(x):
        return (jnp.abs(fft_mm(x)) ** 2).mean()

    def loss_np(x):
        return (jnp.abs(jnp.fft.fft(x)) ** 2).mean()

    g_mm = np.asarray(jax.grad(loss_mm)(jnp.asarray(x)))
    g_np = np.asarray(jax.grad(loss_np)(jnp.asarray(x)))
    np.testing.assert_allclose(g_mm, g_np, atol=1e-3 * np.abs(g_np).max())


def test_plane_apis_match_complex(rng):
    from shadowing_tpu.ops.fft import (
        ifft_analytic_mm,
        ifft_analytic_mm_planes,
        rfft_mm,
        rfft_mm_planes,
    )

    N = 512
    x = rng.standard_normal((3, N)).astype(np.float32)
    r, i = rfft_mm_planes(jnp.asarray(x))
    want = np.asarray(rfft_mm(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(r), want.real)
    np.testing.assert_array_equal(np.asarray(i), want.imag)

    half = N // 2 + 1
    sr = rng.standard_normal((3, half)).astype(np.float32)
    si = rng.standard_normal((3, half)).astype(np.float32)
    wr, wi = ifft_analytic_mm_planes(jnp.asarray(sr), jnp.asarray(si), N)
    want = np.asarray(ifft_analytic_mm(
        jax.lax.complex(jnp.asarray(sr), jnp.asarray(si)), N))
    np.testing.assert_allclose(np.asarray(wr), want.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wi), want.imag, atol=1e-6)
