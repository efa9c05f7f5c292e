"""REINFORCE + prediction loss from a rollout.

Reproduces the reference loss computation exactly
(reference: train_aline.py:112-125):

* reward  R_t = gamma^t * clamp(nll_q[t-1] - nll_q[t], min=0), detached,
  for t = 1..T-1;
* R is normalized ACROSS THE BATCH per step with the unbiased (ddof=1)
  standard deviation (torch ``Tensor.std`` default) + 1e-9;
* design_loss  = -mean(log_probs[:, :-1] * R);
* predict_loss = mean(nll_pred over all steps and batch).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from aline_tpu.train.rollout import RolloutOutputs


def reinforce_losses(ro: RolloutOutputs, gamma: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (design_loss, predict_loss) scalars."""
    T, B = ro.nll_query.shape
    nll_q = jax.lax.stop_gradient(ro.nll_query)              # [T, B]
    gain = jnp.clip(nll_q[:-1] - nll_q[1:], min=0.0)         # [T-1, B]
    discounts = gamma ** jnp.arange(1, T, dtype=jnp.float32)  # t = 1..T-1
    R = gain * discounts[:, None]                            # [T-1, B]
    mean = jnp.mean(R, axis=1, keepdims=True)
    std = jnp.std(R, axis=1, ddof=1, keepdims=True)
    R = (R - mean) / (std + 1e-9)
    design_loss = -jnp.mean(ro.log_probs[:-1] * R)
    predict_loss = jnp.mean(ro.nll_pred)
    return design_loss, predict_loss


def total_loss(ro: RolloutOutputs, gamma: float, alpha_design: jnp.ndarray
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined loss.  ``alpha_design`` is 0.0 during the burning phase
    (prediction-only, reference :126-128) and cfg.alpha afterwards."""
    design_loss, predict_loss = reinforce_losses(ro, gamma)
    loss = alpha_design * design_loss + predict_loss
    metrics = dict(
        loss=loss,
        design_loss=design_loss,
        predict_loss=predict_loss,
        likelihood=-predict_loss,
        targeted_likelihood=-jnp.mean(ro.nll_query),
    )
    return loss, metrics
