"""Normal distribution truncated from below.

Capability parity with the reference ``LowerTruncatedNormal``
(reference: distributions/truncated_normal.py:9-84): inverse-CDF
reparameterized sampling, erf/erfinv-based cdf/icdf, and the same
log-density normalization ``log N(x) - log Phi(2*loc - truncation)``
(which uses Normal symmetry: P(X > trunc) = Phi(2*loc - trunc)).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class LowerTruncatedNormal:
    def __init__(self, loc, scale, truncation):
        self.loc, self.scale, self.truncation = jnp.broadcast_arrays(
            jnp.asarray(loc, jnp.float32), jnp.asarray(scale, jnp.float32),
            jnp.asarray(truncation, jnp.float32))

    # -- internals --------------------------------------------------------
    def _normal_log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - _LOG_SQRT_2PI

    def _normal_cdf(self, value):
        return 0.5 * (1.0 + jax.scipy.special.erf(
            (value - self.loc) / (self.scale * _SQRT2)))

    def _normal_icdf(self, value):
        return self.loc + self.scale * _SQRT2 * jax.scipy.special.erfinv(
            2.0 * value - 1.0)

    # -- public API -------------------------------------------------------
    def rsample(self, key: jax.Array,
                sample_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        """Inverse-CDF sampling (reference:
        distributions/truncated_normal.py:51-56)."""
        shape = tuple(sample_shape) + self.loc.shape
        u = jax.random.uniform(key, shape, dtype=self.loc.dtype)
        raw = self.icdf(u)
        # relu(raw - trunc) + trunc clamps numerical undershoot at the bound.
        return jnp.maximum(raw - self.truncation, 0.0) + self.truncation

    sample = rsample

    def log_prob(self, value):
        return self._normal_log_prob(value) - jnp.log(
            self._normal_cdf(2.0 * self.loc - self.truncation))

    def cdf(self, value):
        return jnp.clip(
            self._normal_cdf(value) - self._normal_cdf(self.truncation),
            min=0.0)

    def icdf(self, value):
        cdf_trunc = self._normal_cdf(self.truncation)
        rescaled = cdf_trunc + (1.0 - cdf_trunc) * value
        return self._normal_icdf(rescaled)
