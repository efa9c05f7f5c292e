"""Psychometric-function experiment (4-parameter, Gumbel link).

Capability parity with the reference ``PsychometricTask``
(reference: tasks/psychometric.py:8-234): theta = (alpha threshold,
beta slope, gamma guess rate, lambda lapse rate), all uniform priors;
``F(x) = 1 - exp(-10^{(x-alpha)/beta})``; Bernoulli outcomes.  The
reference simulates each stimulus with a Python loop (reference :211-212);
here the whole batch is one vectorized Bernoulli draw.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aline_tpu.tasks.base import Batch, Task


class PsychometricTask(Task):
    ALPHA_RANGE = (-3.0, 3.0)
    BETA_RANGE = (0.1, 2.0)
    GAMMA_RANGE = (0.1, 0.9)
    LAMBDA_RANGE = (0.0, 0.5)

    def __init__(self, cfg):
        super().__init__(cfg)

    # -- priors ------------------------------------------------------------
    def sample_theta(self, key: jax.Array,
                     shape: Tuple[int, ...]) -> jnp.ndarray:
        """[*, 4, 1] parameters (reference :69-88)."""
        ks = jax.random.split(key, 4)
        shape = tuple(shape)
        ranges = (self.ALPHA_RANGE, self.BETA_RANGE, self.GAMMA_RANGE,
                  self.LAMBDA_RANGE)
        params = [jax.random.uniform(k, shape, minval=lo, maxval=hi)
                  for k, (lo, hi) in zip(ks, ranges)]
        return jnp.stack(params, axis=-1)[..., None]          # [*, 4, 1]

    def sample_data(self, key: jax.Array, batch_size: int,
                    n_data: int) -> jnp.ndarray:
        """Uniform stimulus intensities in [-scale, scale]
        (reference :90-105)."""
        return jax.random.uniform(
            key, (batch_size, n_data, self.dim_x),
            minval=-self.design_scale, maxval=self.design_scale)

    # stimulus intensity needs no rescaling (reference :136-145)
    def to_design_space(self, xi):
        return xi

    def normalise_design(self, x):
        return x

    def unnormalise_design(self, x):
        return x

    # -- model -------------------------------------------------------------
    def psychometric_function(self, x: jnp.ndarray,
                              theta: jnp.ndarray) -> jnp.ndarray:
        """Response probability (reference :107-134).

        x: [..., 1] stimulus; theta: [..., 4, 1] (or [..., 4]) with
        broadcastable leading dims.  Returns [..., 1].
        """
        if theta.shape[-1] == 1 and theta.shape[-2] == 4:
            theta = theta[..., 0]                            # [..., 4]
        alpha = theta[..., 0:1]
        beta = theta[..., 1:2]
        gamma = theta[..., 2:3]
        lmbda = theta[..., 3:4]
        z = (x - alpha) / beta
        F = 1.0 - jnp.exp(-(10.0 ** z))                      # Gumbel link
        return lmbda * gamma + (1.0 - lmbda) * F

    def simulate(self, key: jax.Array, xi: jnp.ndarray,
                 theta: jnp.ndarray) -> jnp.ndarray:
        """Bernoulli response (reference ``forward`` :158-176)."""
        p = self.psychometric_function(xi, theta)
        return jax.random.bernoulli(key, p).astype(jnp.float32)

    def log_likelihood(self, y, xi, theta):
        """Bernoulli log-likelihood (reference :178-195)."""
        p = self.psychometric_function(xi, theta)
        return y * jnp.log(p + 1e-10) + (1.0 - y) * jnp.log(1.0 - p + 1e-10)

    # -- batch -------------------------------------------------------------
    def sample_batch(self, key: jax.Array, batch_size: int,
                     n_query: Optional[int] = None) -> Batch:
        """(reference :197-222) — one vectorized draw instead of the
        reference's per-stimulus loop."""
        n_query = self.n_query_init if n_query is None else n_query
        k_theta, k_x, k_y = jax.random.split(key, 3)
        theta = self.sample_theta(k_theta, (batch_size,))     # [B, 4, 1]
        n_points = self.n_context_init + n_query
        x = self.sample_data(k_x, batch_size, n_points)       # [B, N, 1]
        y = self.simulate(k_y, x, theta[:, None])             # [B, N, 1]
        target_x = jnp.zeros((batch_size, 0, self.dim_x), x.dtype)
        target_y = jnp.zeros((batch_size, 0, 1), y.dtype)
        return self._pack_batch(x, y, target_x, target_y, theta, theta)
