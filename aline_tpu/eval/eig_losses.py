"""Trajectory-level EIG bound losses.

Capability parity with the reference loss classes
(reference: loss/eig.py:7-151): given full trajectories and a block of
contrastive thetas (with theta_0 prepended at index 0, reference:
utils/eval.py:61-62), compute the sPCE / sNMC losses and the score-gradient
sPCE variant.  These are the dense "all thetas at once" versions used for
training continuous-design policies; the streaming evaluation path lives in
:mod:`aline_tpu.eval.eig`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_seq_logprobs(task, y_outcomes, xi_designs, thetas):
    """Sequential joint log-likelihood (reference: loss/eig.py:22-48).

    Args:
        y_outcomes: [B, T, 1]; xi_designs: [B, T, D];
        thetas: [L, B, ...] latents (index 0 = theta_0 by convention).
    Returns:
        [L, B] trajectory log-likelihoods.
    """
    ll = task.log_likelihood(y_outcomes[None], xi_designs[None],
                             jnp.expand_dims(thetas, 2))    # [L, B, T, 1]
    return jnp.sum(ll, axis=(-2, -1))


def pce_loss(task, y_outcomes, xi_designs, thetas, reduction="mean"):
    """sPCE loss (negated bound, constant removed)
    (reference: loss/eig.py:55-86)."""
    lp = compute_seq_logprobs(task, y_outcomes, xi_designs, thetas)
    loss = jax.nn.logsumexp(lp, axis=0) - lp[0]
    return jnp.mean(loss) if reduction == "mean" else loss


def nmc_loss(task, y_outcomes, xi_designs, thetas, reduction="mean"):
    """sNMC loss: excludes theta_0 from the logsumexp
    (reference: loss/eig.py:120-151)."""
    lp = compute_seq_logprobs(task, y_outcomes, xi_designs, thetas)
    loss = jax.nn.logsumexp(lp[1:], axis=0) - lp[0]
    return jnp.mean(loss) if reduction == "mean" else loss


def pce_loss_score_gradient(task, y_outcomes, xi_designs, thetas,
                            reduction="mean"):
    """Score-gradient estimator of the sPCE loss
    (reference: loss/eig.py:89-117)."""
    lp = compute_seq_logprobs(task, y_outcomes, xi_designs, thetas)
    lp_primary = lp[0]
    lse = jax.nn.logsumexp(lp, axis=0)
    g_no_grad = jax.lax.stop_gradient(lp_primary - lse)
    loss = -(g_no_grad * lp_primary - lse)
    return jnp.mean(loss) if reduction == "mean" else loss
