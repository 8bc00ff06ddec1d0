"""PathDistance API: forward, expansion hooks, streaming forward_topk."""
import jax.numpy as jnp
import numpy as np
import pytest

from shadowing_tpu import MSE, CosineDistance, RelativeMSE
from shadowing_tpu.stats.proba import Softmax, Uniform


class TestForms:
    @pytest.mark.parametrize("dist_cls", [RelativeMSE, MSE, CosineDistance])
    def test_expansion_consistent_with_forward(self, rng, dist_cls):
        d = dist_cls()
        x = rng.normal(size=(5, 16)).astype(np.float32)
        y = rng.normal(size=(7, 16)).astype(np.float32)
        direct = np.asarray(d.forward(x[:, None, :], y[None]))

        x_norm2 = (x**2).sum(-1)[:, None]
        y_norm2 = (y**2).sum(-1)[None, :]
        cross = x @ y.T
        score = np.asarray(d.score(jnp.asarray(x_norm2), jnp.asarray(cross),
                                   jnp.asarray(y_norm2)))
        final = np.asarray(d.finalize(jnp.asarray(x_norm2), jnp.asarray(score)))
        np.testing.assert_allclose(final, direct, rtol=1e-4, atol=1e-5)
        # score ordering matches distance ordering per row
        for b in range(5):
            np.testing.assert_array_equal(np.argsort(score[b], kind="stable"),
                                          np.argsort(direct[b], kind="stable"))

    def test_relative_mse_value(self):
        d = RelativeMSE()
        x = np.array([[3.0, 4.0]])
        y = np.array([[0.0, 0.0]])
        np.testing.assert_allclose(np.asarray(d.forward(x, y)), [1.0])


class TestForwardTopk:
    def test_split_invariance_reference_cell1(self, rng):
        """The reference's testing.ipynb cell 1, verbatim semantics:
        n_splits=32/k=32 vs n_splits=64/k=64 are prefix-identical."""
        distance = RelativeMSE()
        x = rng.normal(size=(8, 34)).astype(np.float32)
        y = rng.normal(size=(128, 512, 34)).astype(np.float32)

        ds1, idces1 = distance.forward_topk(x, y, k=32, n_splits=32)
        ds2, idces2 = distance.forward_topk(x, y, k=64, n_splits=64)

        np.testing.assert_array_equal(np.asarray(ds1), np.asarray(ds2)[:, :32])
        np.testing.assert_array_equal(np.asarray(idces1),
                                      np.asarray(idces2)[:, :32, :])

    def test_matches_bruteforce(self, rng):
        distance = RelativeMSE()
        x = rng.normal(size=(3, 8)).astype(np.float32)
        y = rng.normal(size=(10, 6, 8)).astype(np.float32)
        ds, idces = distance.forward_topk(x, y, k=5, n_splits=2)
        full = np.asarray(distance.forward(x[:, None, None, :], y[None]))
        flat = full.reshape(3, -1)
        order = np.argsort(flat, axis=1, kind="stable")[:, :5]
        np.testing.assert_allclose(np.asarray(ds),
                                   np.take_along_axis(flat, order, 1), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(idces),
            np.stack([order // 6, order % 6], axis=-1),
        )


class TestProba:
    def test_uniform(self, rng):
        x = rng.normal(size=(4, 10, 3))
        u = Uniform()
        np.testing.assert_allclose(np.asarray(u.avg(x, axis=1)), x.mean(1),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u.std(x, axis=1)),
                                   x.std(1), rtol=1e-5)

    def test_softmax_limits(self, rng):
        d = rng.uniform(0.1, 1.0, size=(2, 16))
        x = rng.normal(size=(2, 16, 3))
        # huge eta -> uniform
        s = Softmax(d[:, :, None], eta=1e6)
        np.testing.assert_allclose(np.asarray(s.avg(x, axis=1)), x.mean(1),
                                   rtol=1e-4)
        # tiny eta -> nearest path wins
        s = Softmax(d[:, :, None], eta=1e-4)
        nearest = x[np.arange(2), d.argmin(1)]
        np.testing.assert_allclose(np.asarray(s.avg(x, axis=1)), nearest,
                                   rtol=1e-4)

    def test_softmax_scalar_statistic_alignment(self, rng):
        """(B, k, 1) distances must pair with a (B, k) scalar-per-path
        statistic (trailing singletons squeezed, not mis-broadcast)."""
        B, k = 3, 3  # k == B: the silently-wrong case without alignment
        d = rng.uniform(0.1, 1.0, size=(B, k))
        x = rng.normal(size=(B, k))
        got = np.asarray(Softmax(d[:, :, None], eta=0.3).avg(x, axis=1))
        w = np.exp(-0.5 * (d / 0.3) ** 2)
        w /= w.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(got, (w * x).sum(1), rtol=1e-5)

    def test_softmax_misaligned_raises(self, rng):
        d = rng.uniform(0.1, 1.0, size=(2, 16))
        x = rng.normal(size=(2, 8, 3))
        with pytest.raises(ValueError, match="align"):
            Softmax(d, eta=0.3).avg(x, axis=1)

    def test_softmax_weights_formula(self, rng):
        d = rng.uniform(0.1, 1.0, size=8)
        eta = 0.3
        x = rng.normal(size=(8, 5))
        s = Softmax(d, eta=eta)
        w = np.exp(-0.5 * (d / eta) ** 2)
        w = w / w.sum()
        np.testing.assert_allclose(np.asarray(s.avg(x, axis=0)),
                                   (w[:, None] * x).sum(0), rtol=1e-5)
