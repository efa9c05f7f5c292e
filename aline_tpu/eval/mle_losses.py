"""Posterior maximum-likelihood losses and sample distances.

Capability parity with the reference analysis losses
(reference: loss/mle.py:5-127, loss/distance.py:5-43).  These are not on
the default training path in the reference either (SURVEY.md §2.4) — they
are provided as capabilities for analysis / alternative objectives.

All take a ``log_prob_fn(values) -> log-densities`` or explicit Normal
parameters instead of a torch Distribution class.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from aline_tpu.distributions.gmm import normal_log_prob


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "logsumexp":
        return jax.nn.logsumexp(x, axis=0)
    return x


def nmle_loss(log_prob_fn: Callable, target: jnp.ndarray,
              reduction: str = "mean"):
    """Negative posterior log-likelihood (reference: loss/mle.py:5-35)."""
    lp = log_prob_fn(target)                                 # [B, ...]
    lp = jnp.sum(lp.reshape(lp.shape[0], -1), axis=1)        # [B]
    return -_reduce(lp, reduction)


def sorted_nmle_loss(loc, scale, target, reduction: str = "mean"):
    """Order-matched NMLE for exchangeable latents: sort both the targets
    and the predicted locations along the set axis
    (reference: loss/mle.py:38-61).

    loc/scale/target: [B, K, D].
    """
    target = jnp.sort(target, axis=1)
    order = jnp.argsort(loc, axis=1)
    loc = jnp.take_along_axis(loc, order, axis=1)
    scale = jnp.take_along_axis(scale, order, axis=1)
    lp = normal_log_prob(target, loc, scale)
    lp = jnp.sum(lp.reshape(lp.shape[0], -1), axis=1)
    return -_reduce(lp, reduction)


def chamfer_nmle_loss(loc, scale, target, reduction: str = "mean"):
    """Chamfer-style permutation-invariant NMLE
    (reference: loss/mle.py:65-98): symmetric best-match log-probs between
    the K predicted components and the K targets.

    loc/scale/target: [B, K, D].
    """
    lp = normal_log_prob(target[:, :, None, :], loc[:, None, :, :],
                         scale[:, None, :, :]).sum(-1)       # [B, K, K]
    lp1 = jnp.max(lp, axis=1)                                # [B, K]
    lp2 = jnp.max(lp, axis=2)                                # [B, K]
    score = (lp1.sum(-1) + lp2.sum(-1)) / 2.0                # [B]
    return -_reduce(score, reduction)


def set_nmle_loss(loc, scale, target, reduction: str = "mean"):
    """Logsumexp set-matching NMLE lower bound
    (reference: loss/mle.py:102-127)."""
    lp = normal_log_prob(target[:, :, None, :], loc[:, None, :, :],
                         scale[:, None, :, :]).sum(-1)       # [B, K, K]
    lp = jax.nn.logsumexp(lp, axis=-1).sum(-1)               # [B]
    return -jnp.mean(lp)


def l2_distance(key: jax.Array, loc, scale, target, N: int = 1000,
                reduction: str = "mean"):
    """Expected sorted-sample L2 (EMD-style) distance between posterior
    samples and the true latents (reference: loss/distance.py:5-43).

    loc/scale: [B, K, D] Normal posterior params; target: [B, K, D].
    """
    eps = jax.random.normal(key, (N,) + loc.shape, loc.dtype)
    samples = loc[None] + scale[None] * eps                  # [N, B, K, D]
    samples = jnp.moveaxis(samples, 0, 1)                    # [B, N, K, D]
    samples = jnp.sort(samples, axis=-2)
    target = jnp.sort(target[:, None], axis=-2)              # [B, 1, K, D]
    l2 = jnp.linalg.norm(target - samples, axis=-1)          # [B, N, K]
    l2 = jnp.mean(jnp.sum(l2, axis=-1), axis=-1)             # [B]
    return _reduce(l2, reduction)
