"""Posterior-quality metrics (reference: utils/eval.py:200-232)."""
from __future__ import annotations

import jax.numpy as jnp

from aline_tpu.distributions.gmm import gmm_log_prob, gmm_mean


def compute_ll(value, means, stds, weights):
    """GMM log-likelihood per target token (reference: utils/eval.py:200-207).

    value: [B, n_target]; mixture params: [B, n_target, C] → [B, n_target].
    """
    return gmm_log_prob(value, means, stds, weights)


def compute_rmse(target_values, mixture_means, mixture_stds,
                 mixture_weights, target_weights=None):
    """RMSE of the mixture mean vs targets (reference: utils/eval.py:210-232).

    Unlike the reference (whose mask application is a TODO at :211), an
    optional per-target weight vector restricts/weights the targets.

    Returns [B] per-batch RMSE.
    """
    del mixture_stds
    pred = gmm_mean(mixture_means, mixture_weights)          # [B, n_target]
    vals = target_values[..., 0] if target_values.ndim == 3 else target_values
    sq = (vals - pred) ** 2
    if target_weights is not None:
        w = target_weights / jnp.maximum(target_weights.sum(), 1e-12)
        return jnp.sqrt(jnp.sum(sq * w[None], axis=-1))
    return jnp.sqrt(jnp.mean(sq, axis=-1))
