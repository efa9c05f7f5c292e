"""Hidden-source location-finding BED task.

Capability parity with the reference ``HiddenLocation``
(reference: tasks/location_finding.py:8-204): K hidden sources, signal
``log(base + sum_k 1/(max_signal + ||xi - theta_k||^2))`` with Gaussian
observation noise, closed-form likelihood broadcastable over a leading
contrastive axis for the sPCE/sNMC bounds.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aline_tpu.tasks.base import Batch, Task
from aline_tpu.distributions.gmm import normal_log_prob


class HiddenLocation(Task):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.K = cfg.K
        self.theta_dist = cfg.theta_dist
        self.noise_scale = cfg.noise_scale
        self.base_signal = cfg.base_signal
        self.max_signal = cfg.max_signal
        self.outcome_scale = cfg.outcome_scale

        if self.theta_dist == "uniform":
            # theta ~ U[0,1]^{K x D}; data sampled in the same box
            # (reference :53-58,63).
            self.theta_low = jnp.zeros((self.K, self.dim_x))
            self.theta_high = jnp.ones((self.K, self.dim_x))
            self.data_low, self.data_high = 0.0, 1.0
            default_scale = 1.0
        elif self.theta_dist == "normal":
            # theta ~ N(0, I); designs sampled in [-4, 4]^D
            # (reference :40-51).
            self.theta_loc = jnp.zeros((self.K, self.dim_x))
            self.data_low, self.data_high = -4.0, 4.0
            default_scale = 1.0
        else:
            raise ValueError(
                f"prior distribution type {self.theta_dist!r} not supported")

        # Reference default design_scale = max(theta_cov) (:66-68) which is
        # 1.0 for both supported priors; the config may override it.
        self.design_scale = float(cfg.design_scale or default_scale)

        if self.n_target_theta != self.K * self.dim_x:
            raise ValueError("n_target_theta must equal K * dim_x "
                             "(reference: tasks/location_finding.py:80)")

    # -- priors ------------------------------------------------------------
    def sample_theta(self, key: jax.Array,
                     shape: Tuple[int, ...]) -> jnp.ndarray:
        """[*, K, dim_x] source locations (reference :84-99)."""
        full = tuple(shape) + (self.K, self.dim_x)
        if self.theta_dist == "uniform":
            return jax.random.uniform(key, full)
        return jax.random.normal(key, full)

    def sample_data(self, key: jax.Array, batch_size: int,
                    n_data: int) -> jnp.ndarray:
        """[B, N, dim_x] candidate designs (reference :101-106)."""
        return jax.random.uniform(
            key, (batch_size, n_data, self.dim_x),
            minval=self.data_low, maxval=self.data_high)

    # -- physics -----------------------------------------------------------
    def total_density(self, xi: jnp.ndarray,
                      theta: jnp.ndarray) -> jnp.ndarray:
        """Signal strength (reference :110-130).

        xi: [..., D]; theta: [..., K, D] with broadcastable leading dims.
        Returns [..., 1].
        """
        diff = xi[..., None, :] - theta                     # [..., K, D]
        sq = jnp.sum(diff * diff, axis=-1)                  # [..., K]
        inv = 1.0 / (self.max_signal + sq)
        return jnp.log(self.base_signal + jnp.sum(inv, axis=-1,
                                                  keepdims=True))

    def simulate(self, key: jax.Array, xi: jnp.ndarray,
                 theta: jnp.ndarray) -> jnp.ndarray:
        """Noisy signal observation (reference ``forward`` :132-147).
        xi is in REAL design space (caller unnormalises), matching the
        reference call pattern at :178-179."""
        signal = self.total_density(xi, theta)
        eps = jax.random.normal(key, signal.shape, dtype=signal.dtype)
        return signal + self.noise_scale * eps

    def log_likelihood(self, y, xi, theta):
        """Gaussian log-likelihood (reference :149-164).

        Shapes broadcast: y [..., 1], xi [..., D], theta [..., K, D]
        (e.g. y [1, B, 1], theta [L+1, B, K, D] → [L+1, B, 1]).
        """
        signal = self.total_density(xi, theta)
        return normal_log_prob(y, signal, self.noise_scale)

    # -- batch -------------------------------------------------------------
    def sample_batch(self, key: jax.Array, batch_size: int,
                     n_query: Optional[int] = None) -> Batch:
        """(reference :166-192)."""
        n_query = self.n_query_init if n_query is None else n_query
        k_theta, k_x, k_y = jax.random.split(key, 3)
        theta = self.sample_theta(k_theta, (batch_size,))    # [B, K, D]
        n_points = self.n_context_init + n_query
        x = self.sample_data(k_x, batch_size, n_points)      # normalised
        y = self.simulate(
            k_y, self.unnormalise_design(x),
            theta[:, None])                                  # [B, N, 1]
        theta_tokens = theta.reshape(batch_size, self.n_target_theta, 1)
        target_x = jnp.zeros((batch_size, 0, self.dim_x), x.dtype)
        target_y = jnp.zeros((batch_size, 0, 1), y.dtype)
        return self._pack_batch(x, y, target_x, target_y, theta_tokens, theta)
