"""Baseline design policies: random, grid, and the DAD network.

Capability parity with the reference baselines
(reference: model/baseline.py:6-105, model/mlp.py:5-118).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aline_tpu.distributions.gmm import normal_log_prob


class RandomDesign:
    """Random design policy (reference: model/baseline.py:6-54)."""

    def __init__(self, dim_x: int, random_type: str = "uniform",
                 low: float = 0.0, high: float = 1.0,
                 loc: float = 0.0, scale: float = 1.0):
        if random_type not in ("uniform", "normal"):
            raise ValueError(
                f"Random design type {random_type!r} is not supported!")
        self.dim_x = dim_x
        self.random_type = random_type
        self.low, self.high = low, high
        self.loc, self.scale = loc, scale

    def design_candidates(self, key: jax.Array, batch_size: int = 1,
                          T: int = 30) -> jnp.ndarray:
        """[B, T, D] random designs."""
        shape = (batch_size, T, self.dim_x)
        if self.random_type == "uniform":
            return jax.random.uniform(key, shape, minval=self.low,
                                      maxval=self.high)
        return self.loc + self.scale * jax.random.normal(key, shape)

    def __call__(self, key: jax.Array, batch_size: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One design per batch element + its log-prob."""
        xi = self.design_candidates(key, batch_size, 1)[:, 0]
        if self.random_type == "uniform":
            lp = -jnp.log(self.high - self.low) * jnp.ones(
                (batch_size, self.dim_x))
        else:
            lp = normal_log_prob(xi, self.loc, self.scale)
        return xi, lp.sum(-1)


class GridDesign:
    """Grid design policy (reference: model/baseline.py:57-105)."""

    def __init__(self, dim_x: int, design_scales=None):
        if design_scales is not None and len(design_scales) != dim_x:
            raise ValueError(
                f"The length of design scales {len(design_scales)} "
                f"conflicts with the design dimension {dim_x}!")
        self.dim_x = dim_x
        self.design_scales = design_scales

    def design_candidates(self, batch_size: int = 1,
                          num_points: int = 30) -> jnp.ndarray:
        """[B, num_points**D, D] meshgrid designs."""
        scales = (self.design_scales if self.design_scales is not None
                  else [1.0] * self.dim_x)
        axes = [jnp.linspace(0.0, 1.0, num_points) * s for s in scales]
        grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        grid = grid.reshape(-1, self.dim_x)
        self.xi_designs = grid[None]
        return jnp.broadcast_to(grid[None],
                                (batch_size,) + grid.shape)

    def __call__(self, t: int, batch_size: int) -> jnp.ndarray:
        """The t-th grid design for every batch element."""
        return jnp.broadcast_to(self.xi_designs[:, t],
                                (batch_size, self.dim_x))


class EncoderNetwork(nn.Module):
    """DAD history encoder (reference: model/mlp.py:5-29)."""
    hidden_dim: int
    encoding_dim: int

    @nn.compact
    def __call__(self, xi, y):
        h = jnp.concatenate([xi, y], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim, name="linear1")(h))
        return nn.Dense(self.encoding_dim, name="output_layer")(h)


class EmitterNetwork(nn.Module):
    """DAD design emitter (reference: model/mlp.py:32-44)."""
    design_dim: int

    @nn.compact
    def __call__(self, r):
        return nn.Dense(self.design_dim, name="linear")(r)


class SetEquivariantDesignNetwork(nn.Module):
    """DAD baseline: sum-pooled history encoder + emitter
    (reference: model/mlp.py:48-118, Foster et al. 2021).

    The history is passed with a step-validity mask so the whole T-step
    trace runs as one ``lax.scan`` with static shapes (the reference
    slices a growing history per step).
    """
    dim_x: int
    dim_y: int
    hidden_dim: int = 128
    encoding_dim: int = 16

    def setup(self):
        self.encoder = EncoderNetwork(self.hidden_dim, self.encoding_dim,
                                      name="encoder")
        self.emitter = EmitterNetwork(self.dim_x, name="emitter")
        self.empty_value = self.param("empty_value",
                                      nn.initializers.zeros, (self.dim_x,))

    def __call__(self, xi_hist: jnp.ndarray, y_hist: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
        """Propose the next design.

        Args:
            xi_hist: [B, T, D]; y_hist: [B, T, 1]; valid: [B, T] bool.
        """
        enc = self.encoder(xi_hist, y_hist)                  # [B, T, E]
        pooled = jnp.sum(enc * valid[..., None], axis=1)     # [B, E]
        return self.emitter(pooled)


def run_trace(model: SetEquivariantDesignNetwork, params, task, T: int,
              M: int, key: jax.Array, explore_std: float = 0.0
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Roll out M parallel DAD experiments
    (reference: model/mlp.py:91-118): propose design → simulate → append.

    ``explore_std`` adds reparameterized Gaussian noise to each emitted
    design (normalized units) — used during pathwise sPCE training
    (scripts/train_dad.py) to break the symmetry trap where a
    deterministic policy's expected design gradient vanishes at the
    constant-trajectory initialization; keep 0 for evaluation.

    Returns (theta [M, ...], designs-in-design-space [M, T, D],
    outcomes [M, T, 1]).
    """
    k_theta, k_roll = jax.random.split(key)
    theta = task.sample_theta(k_theta, (M,))

    def step(carry, t):
        xi_hist, y_hist, k = carry
        k, k_sim, k_exp = jax.random.split(k, 3)
        valid = jnp.arange(T)[None, :] < t
        xi = model.apply(params, xi_hist, y_hist,
                         jnp.broadcast_to(valid, (M, T)))    # [M, D]
        if explore_std:
            xi = xi + explore_std * jax.random.normal(k_exp, xi.shape,
                                                      xi.dtype)
        y = task.simulate(k_sim, task.unnormalise_design(xi), theta)
        xi_hist = jax.lax.dynamic_update_slice_in_dim(
            xi_hist, xi[:, None], t, axis=1)
        y_hist = jax.lax.dynamic_update_slice_in_dim(
            y_hist, y[:, None], t, axis=1)
        return (xi_hist, y_hist, k), None

    xi_hist = jnp.zeros((M, T, model.dim_x))
    y_hist = jnp.zeros((M, T, model.dim_y))
    (xi_hist, y_hist, _), _ = jax.lax.scan(
        step, (xi_hist, y_hist, k_roll), jnp.arange(T))
    return theta, task.to_design_space(xi_hist), y_hist
