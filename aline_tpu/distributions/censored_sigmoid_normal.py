"""Sigmoid-transformed Normal censored to ``[lower_lim, upper_lim]``.

Capability parity with the reference ``CensoredSigmoidNormal``
(reference: distributions/censored_sigmoid_normal.py:8-111): a Normal pushed
through a sigmoid, with probability mass at the censoring limits; the
log-mass at the limits falls back to an asymptotic expression when the tail
CDF underflows float32 (reference :60-75).

Used by the CES utility-experiment simulator (reference: tasks/ces.py:165,208).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aline_tpu.distributions.gmm import normal_log_prob


def _logit(y):
    return jnp.log(y) - jnp.log1p(-y)


class CensoredSigmoidNormal:
    def __init__(self, loc, scale, lower_lim, upper_lim,
                 tail_mode: str = "log_ndtr"):
        """``tail_mode`` selects how the log-mass at the censoring limits is
        computed when the tail CDF underflows float32:

        * ``"log_ndtr"`` (default): true Mills-ratio asymptote via
          ``jax.scipy.special.log_ndtr`` — asymptotically exact;
        * ``"reference"``: bit-compatible reproduction of the reference's
          hand-rolled asymptote (reference :60-75), which substitutes the
          *transformed* density ``base_log_prob(lim) - log(crit + |z|)``
          and therefore overestimates the deep-tail log-mass by roughly
          ``|logit(lim)|`` nats.  Use for cross-framework parity runs.
        """
        if tail_mode not in ("log_ndtr", "reference"):
            raise ValueError(f"unknown tail_mode {tail_mode!r}")
        self.tail_mode = tail_mode
        self.loc, self.scale = jnp.broadcast_arrays(
            jnp.asarray(loc, jnp.float32), jnp.asarray(scale, jnp.float32))
        self.upper_lim, self.lower_lim = jnp.broadcast_arrays(
            jnp.asarray(upper_lim, jnp.float32),
            jnp.asarray(lower_lim, jnp.float32))

    # -- base (sigmoid-normal) distribution -------------------------------
    def _z(self, value):
        return (_logit(value) - self.loc) / self.scale

    def _base_log_prob(self, value):
        """log density of sigmoid(Normal) at ``value``:
        N(logit(v)) + log |d logit / dv| = N(logit(v)) - log(v(1-v))."""
        x = _logit(value)
        return (normal_log_prob(x, self.loc, self.scale)
                - jnp.log(value) - jnp.log1p(-value))

    def _base_cdf(self, value):
        return jax.scipy.stats.norm.cdf(_logit(value), self.loc, self.scale)

    # -- public API -------------------------------------------------------
    def rsample(self, key: jax.Array,
                sample_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        """Reparameterized sample: sigmoid of a Normal draw, clamped to the
        censoring limits (reference :43-45)."""
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        x = jax.nn.sigmoid(self.loc + self.scale * eps)
        return jnp.clip(x, self.lower_lim, self.upper_lim)

    sample = rsample

    def log_prob(self, value):
        value, upper_lim, lower_lim = jnp.broadcast_arrays(
            value, self.upper_lim, self.lower_lim)

        log_prob = self._base_log_prob(value)

        # Mass at the censoring limits: log P(X >= upper), log P(X <= lower),
        # computed with log_ndtr which is asymptotically exact in the deep
        # tail.  NOTE divergence from the reference: its hand-rolled
        # asymptote (reference :65-75) approximates the tail CDF with the
        # *transformed* density (which carries the sigmoid Jacobian term
        # -log(y(1-y))), overestimating the tail log-mass by ~|logit(lim)|;
        # log_ndtr gives the true Mills-ratio asymptote.  The two agree
        # wherever the reference takes its non-asymptotic branch.
        if self.tail_mode == "log_ndtr":
            upper_logcdf = jax.scipy.special.log_ndtr(-self._z(upper_lim))
            lower_logcdf = jax.scipy.special.log_ndtr(self._z(lower_lim))
        else:
            # exact reproduction of the reference branch structure
            # (reference :56-75): plain log(cdf) until the tail CDF drops
            # below crit = 2*tiny, then the hand-rolled asymptote
            # base_log_prob(lim) - log(crit + |z|).  Crucially the
            # reference's CDF is torch's erf-based 0.5*(1+erf(z/sqrt2)) in
            # float32, which flushes to 0 already at z ~ -5.4 (where
            # erf rounds to -1) — so its asymptotic branch activates there,
            # not at the true float32 underflow.  Mirror that formula so
            # branch selection matches bit-for-bit.
            crit = 2.0 * jnp.finfo(jnp.float32).tiny
            sqrt2 = jnp.sqrt(jnp.asarray(2.0, jnp.float32))

            def erf_torch_f32(x):
                # torch's float32 erf rounds to exactly +-1 for
                # |x| >= ~3.83251; XLA's erf saturates to 1-2ulp instead,
                # which would keep the log(cdf) branch alive forever.
                return jnp.where(jnp.abs(x) >= 3.8325101,
                                 jnp.sign(x), jax.lax.erf(x))

            upper_cdf = 1.0 - 0.5 * (1.0 + erf_torch_f32(
                self._z(upper_lim) / sqrt2))
            lower_cdf = 0.5 * (1.0 + erf_torch_f32(
                self._z(lower_lim) / sqrt2))
            z_upper = self._z(upper_lim)
            z_lower = self._z(lower_lim)
            asym_upper = (self._base_log_prob(upper_lim)
                          - jnp.log(crit + jnp.abs(z_upper)))
            asym_lower = (self._base_log_prob(lower_lim)
                          - jnp.log(crit + jnp.abs(z_lower)))
            upper_logcdf = jnp.where(upper_cdf < crit, asym_upper,
                                     jnp.log(upper_cdf))
            lower_logcdf = jnp.where(lower_cdf < crit, asym_lower,
                                     jnp.log(lower_cdf))

        log_prob = jnp.where(value == upper_lim, upper_logcdf, log_prob)
        log_prob = jnp.where(value == lower_lim, lower_logcdf, log_prob)
        log_prob = jnp.where(value > upper_lim, -jnp.inf, log_prob)
        log_prob = jnp.where(value < lower_lim, -jnp.inf, log_prob)
        return log_prob

    def cdf(self, value):
        cdf_val = self._base_cdf(value)
        cdf_val = jnp.where(value >= self.upper_lim, 1.0, cdf_val)
        cdf_val = jnp.where(value < self.lower_lim, 0.0, cdf_val)
        return cdf_val
