"""Rolling backtest: alignment, skill on a planted signal, benchmark compare."""
import numpy as np
import pytest

from shadowing_tpu import Identity, PathShadowing, PredictionContext, RelativeMSE
from shadowing_tpu.backtest import rolling_backtest


def vol_clustered_series(rng, n, base=0.01):
    """Two-state vol regime series: contexts carry information about the
    near future, so shadowing must show positive predictive correlation."""
    state = np.zeros(n, dtype=int)
    for t in range(1, n):
        state[t] = state[t - 1] if rng.uniform() > 0.02 else 1 - state[t - 1]
    vol = np.where(state == 0, base, 3 * base)
    return vol * rng.normal(size=n), vol


class TestRollingBacktest:
    def test_alignment_and_shapes(self, rng):
        dataset = rng.normal(0, 0.01, size=(64, 1, 512)).astype(np.float32)
        obj = PathShadowing(Identity(16), RelativeMSE(), dataset,
                            PredictionContext(horizon=20))
        series = rng.normal(0, 0.01, size=300)
        res = rolling_backtest(obj, series, w=16, Ts=[5, 10, 20], k=16,
                               stride=10)
        n_dates = (300 - 16 - 20) // 10 + 1
        assert res.predicted.shape == (n_dates, 3)
        assert res.realized.shape == (n_dates, 3)
        # realized values are plain forward realized variance of the series
        first_fut = series[16:36]
        np.testing.assert_allclose(
            res.realized[0, 2], (first_fut**2).mean() * 252, rtol=1e-5
        )
        assert np.isfinite(res.rmse()).all()
        assert "maturity" in res.summary()

    def test_has_skill_on_clustered_vol(self, rng):
        """Dataset and observed series from the same two-regime process:
        predictions must correlate positively with realized vol."""
        data, _ = vol_clustered_series(rng, 64 * 400)
        dataset = data.reshape(64, 1, 400).astype(np.float32)
        obs, _ = vol_clustered_series(rng, 600)
        obj = PathShadowing(Identity(20), RelativeMSE(), dataset,
                            PredictionContext(horizon=20))
        res = rolling_backtest(obj, obs, w=20, Ts=[10, 20], k=64, stride=5,
                               eta=0.5)
        corr = res.correlation()
        assert (corr > 0.2).all(), corr

    def test_ar_benchmark_columns(self, rng):
        """benchmark='ar-linear' adds Guyon–Lekeufack predictions on the
        same dates, in the same units, and the two-model summary table."""
        data, _ = vol_clustered_series(rng, 64 * 400)
        dataset = data.reshape(64, 1, 400).astype(np.float32)
        obs, _ = vol_clustered_series(rng, 600)
        obj = PathShadowing(Identity(20), RelativeMSE(), dataset,
                            PredictionContext(horizon=20))
        res = rolling_backtest(obj, obs, w=20, Ts=[10, 20], k=64, stride=5,
                               eta=0.5, benchmark="ar-linear")
        n_dates = res.predicted.shape[0]
        assert res.benchmark_predicted.shape == (n_dates, 2)
        assert np.isfinite(res.benchmark_predicted).all()
        assert (res.benchmark_predicted >= 0).all()     # variance units
        # the AR fit on a vol-clustered series must itself carry skill
        assert (res.correlation("benchmark") > 0.1).all()
        assert np.isfinite(res.rmse("benchmark")).all()
        assert "AR linear" in res.summary()
        # out-of-sample training series changes the fit, keeps the contract
        res2 = rolling_backtest(obj, obs, w=20, Ts=[10, 20], k=64, stride=5,
                                eta=0.5, benchmark={"ktype": "exp"},
                                benchmark_train=data[:2000])
        assert np.isfinite(res2.benchmark_predicted).all()
        # PSMC columns are identical — the benchmark never touches them
        np.testing.assert_array_equal(res2.predicted, res.predicted)

    def test_benchmark_accessor_guard(self, rng):
        dataset = rng.normal(0, 0.01, size=(8, 1, 128)).astype(np.float32)
        obj = PathShadowing(Identity(16), RelativeMSE(), dataset,
                            PredictionContext(horizon=10))
        res = rolling_backtest(obj, rng.normal(0, 0.01, size=200), w=16,
                               Ts=[10], k=4, stride=10)
        with pytest.raises(ValueError, match="ar-linear"):
            res.rmse("benchmark")

    def test_horizon_guard(self, rng):
        dataset = rng.normal(0, 0.01, size=(8, 1, 128)).astype(np.float32)
        obj = PathShadowing(Identity(16), RelativeMSE(), dataset,
                            PredictionContext(horizon=5))
        with pytest.raises(ValueError):
            rolling_backtest(obj, rng.normal(size=200), w=16, Ts=[10], k=4)
