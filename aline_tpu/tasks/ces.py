"""Constant-elasticity-of-substitution (CES) utility experiment.

Capability parity with the reference ``CESTask`` (reference: tasks/ces.py:
9-246): theta = (rho ~ Beta(1,1) regularized, alpha ~ Dirichlet(1,1,1),
log u ~ N(1,3)); a design is a pair of 3-commodity baskets in [0,100]^6;
the response is a censored-sigmoid-normal of the scaled utility difference.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aline_tpu.distributions.censored_sigmoid_normal import CensoredSigmoidNormal
from aline_tpu.tasks.base import Batch, Task


class CESTask(Task):
    BASKET_DIM = 3

    def __init__(self, cfg):
        super().__init__(cfg)
        self.n_theta = cfg.n_target_theta  # 5: [rho, alpha1..3, log u]
        self.noise_scale = cfg.noise_scale
        self.epsilon = cfg.epsilon
        # "log_ndtr" (exact tail asymptote, default) or "reference"
        # (bit-compatible with the reference's hand-rolled tail branch,
        # for cross-framework parity runs).
        self.tail_mode = getattr(cfg, "tail_mode", "log_ndtr")

    # -- priors ------------------------------------------------------------
    def sample_theta(self, key: jax.Array,
                     shape: Tuple[int, ...]) -> jnp.ndarray:
        """[*, 5] parameters (reference :51-81)."""
        k_rho, k_alpha, k_u = jax.random.split(key, 3)
        shape = tuple(shape)
        # rho ~ Beta(1,1) = U(0,1), regularized to [0.01, 1.0)
        rho = 0.01 + 0.99 * jax.random.uniform(k_rho, shape)
        # alpha ~ Dirichlet(1,1,1)
        alpha = jax.random.dirichlet(
            k_alpha, jnp.ones((self.BASKET_DIM,)), shape)
        log_u = 1.0 + 3.0 * jax.random.normal(k_u, shape)
        return jnp.concatenate(
            [rho[..., None], alpha, log_u[..., None]], axis=-1)  # [*, 5]

    def sample_data(self, key: jax.Array, batch_size: int,
                    n_data: int) -> jnp.ndarray:
        """Uniform basket pairs in [0, design_scale]^6 (reference :83-94)."""
        return jax.random.uniform(
            key, (batch_size, n_data, 2 * self.BASKET_DIM),
            maxval=self.design_scale)

    # design space is raw for CES (reference :118-123)
    def normalise_design(self, x):
        return x

    def unnormalise_design(self, x):
        return x

    # -- model -------------------------------------------------------------
    @staticmethod
    def utility(x, rho, alpha):
        """CES utility U(x) = (sum_i alpha_i x_i^rho)^(1/rho)
        (reference :96-115).  x: [..., 3]; rho: [..., 1]; alpha: [..., 3]."""
        weighted = jnp.sum(alpha * x ** rho, axis=-1, keepdims=True)
        return weighted ** (1.0 / rho)

    def _response_params(self, xi, theta):
        """Mean/std of the latent preference response.

        xi: [..., 6]; theta: [..., 5]; broadcastable leading dims.
        Returns (mu_eta, sigma_eta) with trailing dim 1.
        """
        rho = theta[..., 0:1]
        alpha = theta[..., 1:4]
        u = jnp.exp(theta[..., 4:5])
        xi = jnp.clip(xi, 0.01, 100.0)
        b1 = xi[..., : self.BASKET_DIM]
        b2 = xi[..., self.BASKET_DIM:]
        udiff = self.utility(b1, rho, alpha) - self.utility(b2, rho, alpha)
        mu_eta = udiff * u
        dist = jnp.linalg.norm(b1 - b2, axis=-1, keepdims=True)
        sigma_eta = (1.0 + dist) * self.noise_scale * u
        return mu_eta, sigma_eta

    def simulate(self, key: jax.Array, xi: jnp.ndarray,
                 theta: jnp.ndarray) -> jnp.ndarray:
        """Preference rating in (0,1), censored at [eps, 1-eps]
        (reference ``forward`` :129-167)."""
        mu, sigma = self._response_params(xi, theta)
        d = CensoredSigmoidNormal(mu, sigma, self.epsilon, 1.0 - self.epsilon,
                                  tail_mode=self.tail_mode)
        return d.rsample(key)

    def log_likelihood(self, y, xi, theta):
        """(reference :169-210).  y [..., 1]; xi [..., 6]; theta [..., 5]."""
        mu, sigma = self._response_params(xi, theta)
        d = CensoredSigmoidNormal(mu, sigma, self.epsilon, 1.0 - self.epsilon,
                                  tail_mode=self.tail_mode)
        return d.log_prob(y)

    # -- batch -------------------------------------------------------------
    def sample_batch(self, key: jax.Array, batch_size: int,
                     n_query: Optional[int] = None) -> Batch:
        """(reference :212-234)."""
        n_query = self.n_query_init if n_query is None else n_query
        k_theta, k_x, k_y = jax.random.split(key, 3)
        theta = self.sample_theta(k_theta, (batch_size,))     # [B, 5]
        n_points = self.n_context_init + n_query
        x = self.sample_data(k_x, batch_size, n_points)
        y = self.simulate(k_y, x, theta[:, None, :])          # [B, N, 1]
        theta_tokens = theta[..., None]                       # [B, 5, 1]
        target_x = jnp.zeros((batch_size, 0, self.dim_x), x.dtype)
        target_y = jnp.zeros((batch_size, 0, 1), y.dtype)
        return self._pack_batch(x, y, target_x, target_y, theta_tokens, theta)
