"""sliding_dot vs direct correlation oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowing_tpu.ops.sliding import sliding_dot


def oracle(y, filt, n_out):
    R, C, T = y.shape
    F, _, w = filt.shape
    out = np.zeros((R, F, n_out))
    for t in range(n_out):
        out[:, :, t] = np.einsum("rcw,fcw->rf", y[:, :, t : t + w], filt)
    return out


@pytest.mark.parametrize("R,C,T,F,w,n_out", [
    (4, 1, 300, 1, 126, 300 - 126 + 1),   # single filter, odd sizes
    (3, 2, 257, 5, 16, 200),              # multichannel, truncated n_out
    (2, 1, 130, 3, 126, 5),               # T barely over w
    (2, 1, 512, 4, 1, 512),               # w = 1 edge
])
def test_matches_oracle(rng, R, C, T, F, w, n_out):
    y = rng.normal(size=(R, C, T)).astype(np.float32)
    filt = rng.normal(size=(F, C, w)).astype(np.float32)
    got = np.asarray(sliding_dot(jnp.asarray(y), jnp.asarray(filt), n_out=n_out))
    want = oracle(y, filt, n_out)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_validates_inputs(rng):
    y = jnp.zeros((2, 1, 64))
    with pytest.raises(ValueError):
        sliding_dot(y, jnp.zeros((1, 2, 8)), n_out=10)  # channel mismatch
    with pytest.raises(ValueError):
        sliding_dot(y, jnp.zeros((1, 1, 8)), n_out=64)  # too many outputs
