"""Pallas fused search (interpret mode on CPU) vs the XLA oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from shadowing_tpu.ops.pallas_search import (
    L,
    MAX_WIDTH,
    _pad_views,
    score_blockmin,
    two_pass_search,
)

TR = 256  # worst-case row tile used to size the test problems
from shadowing_tpu.ops.sliding import sliding_dot


def make_problem(rng, R=TR, T=700, w=126, B=2, C=1):
    y = rng.normal(0, 0.02, size=(R, C, T)).astype(np.float32)
    g = rng.normal(size=(B, C, w)).astype(np.float32)
    n_out = T - w + 1
    ones = np.ones((1, C, w), np.float32)
    norms = np.asarray(
        sliding_dot(jnp.asarray(y**2), jnp.asarray(ones), n_out=n_out)
    )[:, 0]
    return y, g, norms, n_out


@pytest.fixture()
def problem(rng):
    return make_problem(rng)


def oracle_scores(y, g, norms, n_out):
    cross = np.asarray(
        sliding_dot(jnp.asarray(y), jnp.asarray(g), n_out=n_out)
    )  # (R, B, n_out)
    return norms[None] - 2 * np.moveaxis(cross, 1, 0)  # (B, R, n_out)


def check_two_pass(y, g, norms, n_out, k, rtol=1e-4):
    vals, idx, ok = two_pass_search(
        jnp.asarray(y), jnp.asarray(norms), jnp.asarray(g),
        k=k, n_out=n_out, interpret=True,
    )
    assert np.asarray(ok).all()
    s = oracle_scores(y, g, norms, n_out)
    flat = s.reshape(s.shape[0], -1)
    order = np.argsort(flat, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(flat, order, 1), rtol=rtol,
        atol=1e-6,
    )
    # indices agree (values at returned indices are the returned values)
    got_at = np.take_along_axis(flat, np.asarray(idx, np.int64), 1)
    np.testing.assert_allclose(got_at, np.asarray(vals), rtol=rtol, atol=1e-6)


@pytest.mark.parametrize("mxu,rtol,atol", [
    # HIGHEST = f32-faithful 6-pass emulation: tight
    ("highest", 1e-5, 1e-6),
    # bf16x3 = manual 3-pass HIGH (the default): same error class as the
    # fused XLA path's PRECISION_SELECT — ~2^-18-relative split residuals
    ("bf16x3", 1e-4, 2e-5),
])
def test_blockmin_matches_oracle(problem, mxu, rtol, atol):
    y, g, norms, n_out = problem
    w = g.shape[-1]
    y3, n2 = _pad_views(jnp.asarray(y), jnp.asarray(norms), n_out, w)
    nblk = n2.shape[1] // L
    Rp, C, cols = y3.shape
    bmin = np.asarray(
        score_blockmin(y3.reshape(Rp, C * cols), n2, jnp.asarray(g),
                       interpret=True, mxu=mxu)
    )  # (B, R, nblk)
    s = oracle_scores(y, g, norms, n_out)
    s_pad = np.pad(s, ((0, 0), (0, 0), (0, nblk * L - n_out)),
                   constant_values=np.inf)
    want = s_pad.reshape(s.shape[0], s.shape[1], nblk, L).min(axis=-1)
    np.testing.assert_allclose(bmin, want, rtol=rtol, atol=atol)


def test_two_pass_exact(problem):
    y, g, norms, n_out = problem
    check_two_pass(y, g, norms, n_out, k=64)


def test_two_pass_multichannel(rng):
    """C=3 data: the kernel accumulates one Toeplitz matmul per channel."""
    y, g, norms, n_out = make_problem(rng, T=500, w=40, C=3)
    check_two_pass(y, g, norms, n_out, k=48)


def test_two_pass_wide_filter(rng):
    """w=252 (the reference's horizon regime) spans 3 L-blocks."""
    y, g, norms, n_out = make_problem(rng, T=900, w=252)
    check_two_pass(y, g, norms, n_out, k=32)


def test_two_pass_large_k(rng):
    """k > 4096: selection sizes are plain tournament parameters."""
    y, g, norms, n_out = make_problem(rng, R=TR * 2, T=700, w=20, B=1)
    check_two_pass(y, g, norms, n_out, k=5000)


def test_two_pass_no_padded_winners(rng):
    """R not a multiple of TR and n_out not a multiple of L: padded slots
    must never be selected."""
    R, T, w = TR + 37, 400, 21
    y, g, norms, n_out = make_problem(rng, R=R, T=T, w=w, B=1)
    k = 32
    vals, idx, ok = two_pass_search(
        jnp.asarray(y), jnp.asarray(norms), jnp.asarray(g),
        k=k, n_out=n_out, interpret=True,
    )
    assert np.asarray(ok).all()
    traj = np.asarray(idx) // n_out
    t = np.asarray(idx) % n_out
    assert (traj < R).all()
    assert (t < n_out).all()
    assert np.isfinite(np.asarray(vals)).all()


def test_wide_filter_rejected(rng):
    y = jnp.zeros((TR, 1, 900), jnp.float32)
    g = jnp.zeros((1, 1, MAX_WIDTH + 1), jnp.float32)
    with pytest.raises(ValueError):
        two_pass_search(y, jnp.zeros((TR, 400)), g, k=4, n_out=400,
                        interpret=True)
