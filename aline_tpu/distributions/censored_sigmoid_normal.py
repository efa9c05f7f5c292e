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
    def __init__(self, loc, scale, lower_lim, upper_lim):
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
        upper_logcdf = jax.scipy.special.log_ndtr(-self._z(upper_lim))
        lower_logcdf = jax.scipy.special.log_ndtr(self._z(lower_lim))

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
