"""Mixture-of-Gaussians as fused functional primitives.

Capability parity with the reference's ``MixtureOfGaussians``
(reference: distributions/gmm.py:5-78), redesigned as pure functions over
parameter arrays so they compile into the surrounding loss (one fused XLA
logsumexp instead of a torch Distribution object graph).

Conventions: the trailing axis of ``means``/``stds``/``weights`` is the
component axis C.  ``value`` has the shape of ``means`` without C.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def normal_log_prob(value: jnp.ndarray, loc: jnp.ndarray,
                    scale: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Normal log-density (broadcasting)."""
    z = (value - loc) / scale
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)


def gmm_log_prob(value: jnp.ndarray, means: jnp.ndarray, stds: jnp.ndarray,
                 weights: jnp.ndarray) -> jnp.ndarray:
    """GMM log-density: ``logsumexp_c [ N(value | m_c, s_c) + log w_c ]``.

    Matches the reference's ``compute_ll`` primitive
    (reference: utils/eval.py:200-207, model/head.py:232-249).

    Args:
        value:   [...] sample values.
        means:   [..., C]
        stds:    [..., C]
        weights: [..., C] mixture weights (sum to 1 over C).

    Returns:
        [...] log-likelihoods.
    """
    lp = normal_log_prob(value[..., None], means, stds)
    return jax.nn.logsumexp(lp + jnp.log(weights), axis=-1)


def gmm_sample(key: jax.Array, means: jnp.ndarray, stds: jnp.ndarray,
               weights: jnp.ndarray,
               sample_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
    """Sample via categorical component selection + component Normal
    (reference: distributions/gmm.py:45-56).

    Returns an array of shape ``sample_shape + means.shape[:-1]``.
    """
    k_cat, k_norm = jax.random.split(key)
    batch_shape = means.shape[:-1]
    out_shape = tuple(sample_shape) + batch_shape
    logits = jnp.log(weights)
    idx = jax.random.categorical(
        k_cat, jnp.broadcast_to(logits, out_shape + logits.shape[-1:]),
        axis=-1)                                              # [S..., batch]
    eps = jax.random.normal(k_norm, out_shape, dtype=means.dtype)
    sel_mean = jnp.take_along_axis(
        jnp.broadcast_to(means, out_shape + means.shape[-1:]),
        idx[..., None], axis=-1)[..., 0]
    sel_std = jnp.take_along_axis(
        jnp.broadcast_to(stds, out_shape + stds.shape[-1:]),
        idx[..., None], axis=-1)[..., 0]
    return sel_mean + sel_std * eps


def gmm_mean(means: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Analytic mixture mean (reference: distributions/gmm.py:69-72)."""
    return jnp.sum(weights * means, axis=-1)


def gmm_variance(means: jnp.ndarray, stds: jnp.ndarray,
                 weights: jnp.ndarray) -> jnp.ndarray:
    """Analytic mixture variance (reference: distributions/gmm.py:74-78,
    utils/misc.py:244-279)."""
    mean = gmm_mean(means, weights)
    second = jnp.sum(weights * (means ** 2 + stds ** 2), axis=-1)
    return second - mean ** 2


class MixtureOfGaussians:
    """Thin object wrapper over the functional primitives, for API parity
    with the reference distribution class (reference: distributions/gmm.py:5).
    """

    def __init__(self, means: jnp.ndarray, stds: jnp.ndarray,
                 weights: jnp.ndarray):
        assert means.shape == stds.shape
        self.means = means
        self.stds = stds
        self.weights = weights

    def log_prob(self, value: jnp.ndarray) -> jnp.ndarray:
        return gmm_log_prob(value, self.means, self.stds, self.weights)

    def sample(self, key: jax.Array,
               sample_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        return gmm_sample(key, self.means, self.stds, self.weights,
                          sample_shape)

    # rsample == sample under JAX (sampling is already reparameterized
    # through the normal eps; the categorical index is non-differentiable
    # in both frameworks).
    rsample = sample

    @property
    def mean(self) -> jnp.ndarray:
        return gmm_mean(self.means, self.weights)

    @property
    def variance(self) -> jnp.ndarray:
        return gmm_variance(self.means, self.stds, self.weights)
