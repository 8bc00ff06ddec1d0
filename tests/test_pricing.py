"""Hedged Monte Carlo: Black-Scholes limit, measures, smile object."""
import numpy as np
import pytest

from shadowing_tpu import PriceData, Softmax, compute_smile
from shadowing_tpu.pricing.black_scholes import bs_call_price, bs_implied_vol


class TestBlackScholes:
    def test_price_known_value(self):
        # S=100, K=100, tau=1, sigma=0.2, r=0 -> C ~ 7.9656
        c = float(bs_call_price(100.0, 100.0, 1.0, 0.2, 0.0))
        assert c == pytest.approx(7.9656, abs=2e-3)

    def test_implied_vol_roundtrip(self, rng):
        # strikes kept where vega is meaningful — deep ITM/OTM short-dated
        # options are numerically vol-insensitive by nature
        spot = 100.0
        strikes = np.linspace(85, 115, 13)
        taus = np.array([0.1, 0.5, 1.0])[:, None]
        sigma = 0.27
        prices = np.asarray(bs_call_price(spot, strikes[None], taus, sigma, 0.01))
        iv = np.asarray(bs_implied_vol(prices, spot, strikes[None], taus, 0.01))
        np.testing.assert_allclose(iv, sigma, rtol=1e-3)


def gbm_paths(rng, n, T, sigma, s0=100.0, r=0.0):
    dt = 1 / 252
    z = rng.standard_normal((n, T))
    dlnx = (r - 0.5 * sigma**2) * dt + sigma * np.sqrt(dt) * z
    return PriceData(dlnx=dlnx, x_init=s0).x


class TestHedgedMC:
    def test_flat_smile_on_gbm(self, rng):
        """On geometric Brownian paths the smile must be flat at the true
        vol for every maturity and moneyness (the PBS sanity check)."""
        sigma = 0.2
        x = gbm_paths(rng, 16384, 30, sigma)
        smile = compute_smile(x, Ts=[5, 10, 25], Ms=np.linspace(-2, 2, 9))
        assert smile.vols.shape == (3, 9)
        np.testing.assert_allclose(smile.vols, sigma, rtol=0.05)
        # ATM should be extremely tight (hedging kills the MC variance)
        np.testing.assert_allclose(smile.vols[:, 4], sigma, rtol=0.02)

    def test_interest_rate(self, rng):
        sigma, r = 0.2, 0.03
        x = gbm_paths(rng, 16384, 25, sigma, r=r)
        smile = compute_smile(x, Ts=[25], Ms=[-1.0, 0.0, 1.0], r=r)
        np.testing.assert_allclose(smile.vols[0], sigma, rtol=0.05)

    def test_heavy_tails_produce_smile(self, rng):
        """Student-t returns must produce convex vol-of-moneyness."""
        dt = 1 / 252
        t5 = rng.standard_t(4, size=(16384, 25))
        t5 /= t5.std()
        x = PriceData(dlnx=0.2 * np.sqrt(dt) * t5, x_init=100.0).x
        smile = compute_smile(x, Ts=[25], Ms=np.linspace(-2, 2, 9))
        v = smile.vols[0]
        assert v[0] > v[4] * 1.02 and v[-1] > v[4] * 1.02

    def test_no_arbitrage_price_shape(self, rng):
        """Hedged-MC call prices must be decreasing and convex in strike
        with slope in [-1, 0] (static no-arbitrage) — the hedging control
        variate keeps MC noise far below these margins."""
        dt = 1 / 252
        t5 = rng.standard_t(4, size=(16384, 25))
        t5 /= t5.std()
        x = PriceData(dlnx=0.2 * np.sqrt(dt) * t5, x_init=100.0).x
        smile = compute_smile(x, Ts=[25], Ms=np.linspace(-2, 2, 11))
        K = np.asarray(smile.strikes)[0]
        P = np.asarray(smile.prices)[0]
        dP = np.diff(P) / np.diff(K)
        assert (dP < 0).all() and (dP > -1).all()   # monotone, slope bound
        assert (np.diff(P, 2) > 0).all()            # convex in strike

    def test_weighted_measure(self, rng):
        """A Softmax measure concentrated on low-vol paths must lower the
        ATM implied vol vs uniform."""
        sigma_lo, sigma_hi = 0.1, 0.4
        x = np.concatenate(
            [gbm_paths(rng, 4096, 20, sigma_lo), gbm_paths(rng, 4096, 20, sigma_hi)]
        )
        dists = np.concatenate([np.full(4096, 0.1), np.full(4096, 2.0)])
        smile_w = compute_smile(x, Ts=[20], Ms=[0.0], ave=Softmax(dists, eta=0.3))
        smile_u = compute_smile(x, Ts=[20], Ms=[0.0])
        assert smile_w.vols[0, 0] < smile_u.vols[0, 0] * 0.7
        assert smile_w.vols[0, 0] == pytest.approx(sigma_lo, rel=0.1)

    def test_input_validation(self, rng):
        x = gbm_paths(rng, 128, 10, 0.2)
        with pytest.raises(ValueError):
            compute_smile(x, Ts=[50], Ms=[0.0])  # maturity too long
        with pytest.raises(ValueError):
            # paths with differing initial prices
            compute_smile(x * np.linspace(1, 2, 128)[:, None], Ts=[5], Ms=[0.0])

    @pytest.mark.parametrize("tails", ["gbm", "student_t"])
    def test_knot_grid_equivalence(self, rng, tails):
        """The N>=2048 lognormal-moment knot grid must price like the exact
        empirical-quantile grid it replaces (the knots only parameterise the
        hat REGRESSION basis, so any mass-covering grid is unbiased): both
        branches at the same N=4096 paths, GBM and heavy-tailed, must agree
        to ~0.5 vol point everywhere on the smile. Guards the branch switch
        at N=2048 (prices must not move discontinuously with path count) and
        future knot tweaks against silently shifting the smile's wings."""
        import jax.numpy as jnp

        from shadowing_tpu.pricing.hedged_mc import _hmc_prices

        dt = 1 / 252
        N, T, sigma = 4096, 25, 0.2
        if tails == "gbm":
            z = rng.standard_normal((N, T))
        else:
            z = rng.standard_t(4, size=(N, T))
            z /= z.std()
        x = PriceData(dlnx=sigma * np.sqrt(dt) * z, x_init=100.0).x
        tau = T * dt
        rv = (np.diff(np.log(x), axis=1) ** 2).sum(axis=1) / tau
        sigma_T = float(np.sqrt(rv.mean()))
        Ms = np.linspace(-2, 2, 9)
        strikes = 100.0 * np.exp(Ms * sigma_T * np.sqrt(tau))
        args = (jnp.asarray(x, jnp.float32), jnp.full((N,), 1.0 / N),
                jnp.asarray(strikes, jnp.float32), jnp.asarray(1.0))
        p_emp = np.asarray(_hmc_prices(*args, n_basis=12, knots="empirical"))
        p_mom = np.asarray(_hmc_prices(*args, n_basis=12, knots="moment"))
        v_emp = np.asarray(bs_implied_vol(p_emp, 100.0, strikes, tau, 0.0))
        v_mom = np.asarray(bs_implied_vol(p_mom, 100.0, strikes, tau, 0.0))
        assert np.isfinite(v_emp).all() and np.isfinite(v_mom).all()
        np.testing.assert_allclose(v_mom, v_emp, atol=5e-3)

    def test_plot_smoke(self, rng, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        x = gbm_paths(rng, 2048, 10, 0.2)
        smile = compute_smile(x, Ts=[5, 10], Ms=np.linspace(-1, 1, 5))
        ax = smile.plot(color="coral", rescale=True, legend=True)
        assert len(ax.lines) == 2


class TestImpliedVolEdges:
    def test_out_of_bracket_prices_are_nan(self):
        # below the sigma_lo price (sub-intrinsic) and above the sigma_hi price
        iv_low = np.asarray(bs_implied_vol(4.0, 100.0, 105.0, 1e-8))
        assert np.isnan(iv_low)
        iv_high = np.asarray(bs_implied_vol(99.0, 100.0, 100.0, 5 / 252))
        assert np.isnan(iv_high)

    def test_boundary_price_solvable(self):
        # exactly the sigma_lo price must solve (to ~sigma_lo), not NaN
        from shadowing_tpu.pricing.black_scholes import SIGMA_LO, bs_call_price

        p = bs_call_price(100.0, 90.0, 10 / 252, SIGMA_LO)
        iv = np.asarray(bs_implied_vol(p, 100.0, 90.0, 10 / 252))
        assert np.isfinite(iv) and iv < 1e-3

    def test_array_tau_broadcast(self):
        taus = np.array([[0.1], [0.5]])
        prices = np.asarray(bs_call_price(100.0, 100.0, taus, 0.2))
        iv = np.asarray(bs_implied_vol(prices, 100.0, 100.0, taus))
        assert iv.shape == (2, 1)
        np.testing.assert_allclose(iv, 0.2, rtol=1e-3)


class TestBatchedSmile:
    def test_batch_matches_per_context(self, rng):
        """compute_smile_batch == B independent compute_smile calls."""
        from shadowing_tpu import compute_smile_batch

        B, N, T = 3, 256, 30
        xs, ws = [], []
        for b in range(B):
            x = gbm_paths(rng, N, T, sigma=0.15 + 0.05 * b)
            w = rng.uniform(0.5, 1.5, size=N)
            xs.append(x)
            ws.append(w)
        Ts, Ms = [5, 20], np.linspace(-1, 1, 5)
        batch = compute_smile_batch(
            np.stack(xs), Ts, Ms, r=0.01, weights=np.stack(ws)
        )
        assert len(batch) == B
        for b in range(B):
            from shadowing_tpu.stats.proba import DiscreteProba
            import jax.numpy as jnp

            class _W(DiscreteProba):
                def weights_like(self, x, axis):
                    w = jnp.asarray(ws[b])
                    while w.ndim < jnp.asarray(x).ndim:
                        w = w[..., None]
                    return w / w.sum(axis=axis, keepdims=True)

            single = compute_smile(xs[b], Ts, Ms, r=0.01, ave=_W())
            np.testing.assert_allclose(batch[b].prices, single.prices,
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(batch[b].strikes, single.strikes,
                                       rtol=1e-5)

    def test_batch_validation(self, rng):
        from shadowing_tpu import compute_smile_batch

        x = gbm_paths(rng, 16, 10, sigma=0.2)[None]
        x2 = np.array(x)
        x2[0, 3, 0] *= 1.5  # break the common-S0 contract in row 0
        with pytest.raises(ValueError, match="initial price"):
            compute_smile_batch(x2, [5], [0.0])
        with pytest.raises(ValueError, match="weights"):
            compute_smile_batch(x, [5], [0.0], weights=np.ones((2, 16)))
