"""Pallas fused search (interpret mode on CPU) vs the XLA oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from shadowing_tpu.ops.pallas_search import (
    L,
    _rows_per_tile,
    score_blockmin,
    two_pass_search,
    _pad_views,
)

TR = 256  # worst-case row tile used to size the test problems
from shadowing_tpu.ops.sliding import sliding_dot


@pytest.fixture()
def problem(rng):
    R, T, w, B = TR, 700, 126, 2
    y = rng.normal(0, 0.02, size=(R, 1, T)).astype(np.float32)
    g = rng.normal(size=(B, 1, w)).astype(np.float32)
    n_out = T - w + 1
    ones = np.ones((1, 1, w), np.float32)
    norms = np.asarray(
        sliding_dot(jnp.asarray(y**2), jnp.asarray(ones), n_out=n_out)
    )[:, 0]
    return y, g, norms, n_out


def oracle_scores(y, g, norms, n_out):
    B = g.shape[0]
    cross = np.asarray(
        sliding_dot(jnp.asarray(y), jnp.asarray(g), n_out=n_out)
    )  # (R, B, n_out)
    return norms[None] - 2 * np.moveaxis(cross, 1, 0)  # (B, R, n_out)


def test_blockmin_matches_oracle(problem):
    y, g, norms, n_out = problem
    y2, n2 = _pad_views(jnp.asarray(y), jnp.asarray(norms), n_out)
    nblk = n2.shape[1] // L
    bmin = np.asarray(
        score_blockmin(y2, n2, jnp.asarray(g[:, 0, :]), interpret=True)
    )  # (B, R, nblk)
    s = oracle_scores(y, g, norms, n_out)
    s_pad = np.pad(s, ((0, 0), (0, 0), (0, nblk * L - n_out)),
                   constant_values=np.inf)
    want = s_pad.reshape(s.shape[0], s.shape[1], nblk, L).min(axis=-1)
    np.testing.assert_allclose(bmin, want, rtol=1e-5, atol=1e-6)


def test_two_pass_exact(problem):
    y, g, norms, n_out = problem
    k = 64
    vals, idx, ok = two_pass_search(
        jnp.asarray(y), jnp.asarray(norms), jnp.asarray(g),
        k=k, n_out=n_out, interpret=True,
    )
    assert np.asarray(ok).all()
    s = oracle_scores(y, g, norms, n_out)
    flat = s.reshape(s.shape[0], -1)
    order = np.argsort(flat, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(flat, order, 1), rtol=1e-4,
        atol=1e-6,
    )
    # indices agree (values at returned indices are the returned values)
    got_at = np.take_along_axis(flat, np.asarray(idx, np.int64), 1)
    np.testing.assert_allclose(got_at, np.asarray(vals), rtol=1e-4, atol=1e-6)


def test_two_pass_no_padded_winners(rng):
    """R not a multiple of TR and n_out not a multiple of L: padded slots
    must never be selected."""
    R, T, w = TR + 37, 400, 21
    y = rng.normal(0, 1, size=(R, 1, T)).astype(np.float32)
    g = rng.normal(size=(1, 1, w)).astype(np.float32)
    n_out = T - w + 1
    ones = np.ones((1, 1, w), np.float32)
    norms = np.asarray(
        sliding_dot(jnp.asarray(y**2), jnp.asarray(ones), n_out=n_out)
    )[:, 0]
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
    y = jnp.zeros((TR, 1, 600), jnp.float32)
    g = jnp.zeros((1, 1, L + 10), jnp.float32)
    with pytest.raises(ValueError):
        two_pass_search(y, jnp.zeros((TR, 400)), g, k=4, n_out=400,
                        interpret=True)
