"""Unit tests for the distribution layer vs scipy closed forms
(SURVEY.md §4(b): distribution log_prob/sample round-trips vs scipy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from aline_tpu.distributions import (
    CensoredSigmoidNormal,
    LowerTruncatedNormal,
    MixtureOfGaussians,
    gmm_log_prob,
    gmm_mean,
    gmm_sample,
    gmm_variance,
)


# ---------------------------------------------------------------------------
# GMM
# ---------------------------------------------------------------------------

class TestGMM:
    def _params(self, np_rng, shape=(3, 4), C=5):
        means = np_rng.normal(size=shape + (C,)).astype(np.float32)
        stds = np_rng.uniform(0.2, 2.0, size=shape + (C,)).astype(np.float32)
        w = np_rng.uniform(0.1, 1.0, size=shape + (C,)).astype(np.float32)
        w = w / w.sum(-1, keepdims=True)
        return means, stds, w

    def test_log_prob_matches_scipy(self, np_rng):
        means, stds, w = self._params(np_rng)
        x = np_rng.normal(size=(3, 4)).astype(np.float32)
        got = np.asarray(gmm_log_prob(jnp.array(x), jnp.array(means),
                                      jnp.array(stds), jnp.array(w)))
        # scipy per-element mixture density
        dens = (w * sps.norm.pdf(x[..., None], means, stds)).sum(-1)
        np.testing.assert_allclose(got, np.log(dens), rtol=1e-5, atol=1e-5)

    def test_mean_variance(self, np_rng):
        means, stds, w = self._params(np_rng)
        m = np.asarray(gmm_mean(jnp.array(means), jnp.array(w)))
        v = np.asarray(gmm_variance(jnp.array(means), jnp.array(stds),
                                    jnp.array(w)))
        m_ref = (w * means).sum(-1)
        v_ref = (w * (means ** 2 + stds ** 2)).sum(-1) - m_ref ** 2
        np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(v, v_ref, rtol=1e-4, atol=1e-5)

    def test_sample_moments(self, rng_key, np_rng):
        means, stds, w = self._params(np_rng, shape=(2,), C=3)
        samples = gmm_sample(rng_key, jnp.array(means), jnp.array(stds),
                             jnp.array(w), sample_shape=(20000,))
        assert samples.shape == (20000, 2)
        emp_mean = np.asarray(samples).mean(0)
        emp_var = np.asarray(samples).var(0)
        m_ref = (w * means).sum(-1)
        v_ref = (w * (means ** 2 + stds ** 2)).sum(-1) - m_ref ** 2
        np.testing.assert_allclose(emp_mean, m_ref, atol=0.06)
        np.testing.assert_allclose(emp_var, v_ref, rtol=0.1)

    def test_class_wrapper(self, rng_key, np_rng):
        means, stds, w = self._params(np_rng, shape=(4,), C=2)
        d = MixtureOfGaussians(jnp.array(means), jnp.array(stds), jnp.array(w))
        x = jnp.zeros((4,))
        lp = d.log_prob(x)
        assert lp.shape == (4,)
        s = d.sample(rng_key, (7,))
        assert s.shape == (7, 4)
        assert d.mean.shape == (4,)
        assert d.variance.shape == (4,)


# ---------------------------------------------------------------------------
# Lower-truncated normal
# ---------------------------------------------------------------------------

class TestLowerTruncatedNormal:
    def test_log_prob_cdf_vs_scipy(self):
        loc, scale, trunc = 0.5, 1.3, -0.4
        d = LowerTruncatedNormal(loc, scale, trunc)
        a = (trunc - loc) / scale
        ref = sps.truncnorm(a, np.inf, loc=loc, scale=scale)
        xs = np.linspace(trunc + 1e-3, loc + 4 * scale, 50).astype(np.float32)
        np.testing.assert_allclose(np.asarray(d.log_prob(jnp.array(xs))),
                                   ref.logpdf(xs), rtol=1e-4, atol=1e-4)
        # Reference cdf is the UNNORMALIZED Phi(x) - Phi(trunc)
        # (reference: distributions/truncated_normal.py:74-77).
        phi = sps.norm(loc, scale).cdf
        np.testing.assert_allclose(np.asarray(d.cdf(jnp.array(xs))),
                                   phi(xs) - phi(trunc), rtol=1e-5, atol=1e-5)

    def test_icdf_roundtrip_and_sampling(self, rng_key):
        d = LowerTruncatedNormal(jnp.zeros(()), jnp.ones(()), jnp.array(-1.0))
        u = jnp.linspace(0.01, 0.99, 21)
        x = d.icdf(u)
        assert bool(jnp.all(x >= -1.0))
        samples = d.rsample(rng_key, (50000,))
        assert bool(jnp.all(samples >= -1.0))
        ref = sps.truncnorm(-1.0, np.inf, loc=0.0, scale=1.0)
        assert abs(float(samples.mean()) - ref.mean()) < 0.02
        assert abs(float(samples.var()) - ref.var()) < 0.03

    def test_rsample_differentiable(self, rng_key):
        def f(loc):
            d = LowerTruncatedNormal(loc, 1.0, -1.0)
            return d.rsample(rng_key, (100,)).mean()
        g = jax.grad(f)(jnp.array(0.0))
        assert np.isfinite(float(g)) and float(g) > 0


# ---------------------------------------------------------------------------
# Censored sigmoid normal
# ---------------------------------------------------------------------------

class TestCensoredSigmoidNormal:
    def _dist(self, loc=0.3, scale=0.8, eps=2.0 ** -22):
        return CensoredSigmoidNormal(loc, scale, eps, 1.0 - eps), loc, scale, eps

    def test_interior_log_prob_vs_change_of_variables(self):
        d, loc, scale, _ = self._dist()
        ys = np.linspace(0.05, 0.95, 19).astype(np.float32)
        x = np.log(ys) - np.log1p(-ys)
        ref = sps.norm(loc, scale).logpdf(x) - np.log(ys * (1 - ys))
        got = np.asarray(d.log_prob(jnp.array(ys)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_censored_mass_at_limits(self):
        d, loc, scale, eps = self._dist(loc=0.0, scale=1.0)
        logit = lambda v: np.log(v) - np.log1p(-v)
        # P(Y == lower) = Phi(logit(eps)); P(Y == upper) = 1 - Phi(logit(1-eps))
        lp_low = float(d.log_prob(jnp.array(eps, jnp.float32)))
        lp_high = float(d.log_prob(jnp.array(1.0 - eps, jnp.float32)))
        ref_low = sps.norm(0, 1).logcdf(logit(eps))
        ref_high = sps.norm(0, 1).logsf(logit(1.0 - eps))
        np.testing.assert_allclose(lp_low, ref_low, rtol=1e-3)
        np.testing.assert_allclose(lp_high, ref_high, rtol=1e-3)

    def test_asymptotic_tail_is_finite_and_accurate(self):
        # Large |loc| drives the tail CDF below float32 tiny; log_ndtr must
        # keep log_prob finite AND match the float64 scipy log-mass
        # (the reference's hand-rolled asymptote is biased by the sigmoid
        # Jacobian; see censored_sigmoid_normal.py docstring).
        eps = 2.0 ** -22
        logit = lambda v: np.log(v) - np.log1p(-v)
        d = CensoredSigmoidNormal(40.0, 0.5, eps, 1.0 - eps)
        lp = float(d.log_prob(jnp.array(eps, jnp.float32)))
        ref = sps.norm(40.0, 0.5).logcdf(logit(eps))
        assert np.isfinite(lp)
        np.testing.assert_allclose(lp, ref, rtol=1e-4)
        d2 = CensoredSigmoidNormal(-40.0, 0.5, eps, 1.0 - eps)
        lp2 = float(d2.log_prob(jnp.array(1.0 - eps, jnp.float32)))
        ref2 = sps.norm(-40.0, 0.5).logsf(logit(1.0 - eps))
        assert np.isfinite(lp2)
        np.testing.assert_allclose(lp2, ref2, rtol=1e-4)

    def test_outside_support_is_neg_inf(self):
        d, *_ = self._dist()
        assert float(d.log_prob(jnp.array(1e-8, jnp.float32))) == -np.inf

    def test_sampling_respects_limits(self, rng_key):
        d, *_ = self._dist(loc=5.0, scale=3.0)
        s = d.rsample(rng_key, (10000,))
        assert bool(jnp.all(s >= d.lower_lim)) and bool(jnp.all(s <= d.upper_lim))

    def test_cdf(self):
        d, loc, scale, eps = self._dist()
        ys = np.array([0.2, 0.5, 0.8], np.float32)
        x = np.log(ys) - np.log1p(-ys)
        np.testing.assert_allclose(np.asarray(d.cdf(jnp.array(ys))),
                                   sps.norm(loc, scale).cdf(x), rtol=1e-5)
