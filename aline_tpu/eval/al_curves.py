"""Amortized active-learning evaluation curves.

Capability parity with the reference notebook evaluation path
(reference: utils/plot_config.py:167-320 ``calculate_targeted_log_prob``
and notebooks/eval_al.ipynb): roll the trained model out for T steps under
an acquisition strategy and record per-step targeted log-likelihood and
RMSE curves.

Strategies (reference :167-320):
* ``aline``       — the model's own acquisition policy (greedy argmax),
* ``random``      — uniform choice among remaining pool points,
* ``uncertainty`` — ACE-style uncertainty sampling: argmax of the GMM
                    predictive variance over the pool
                    (reference: utils/misc.py:244-279).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from aline_tpu.distributions.gmm import gmm_log_prob, gmm_variance
from aline_tpu.eval.metrics import compute_rmse
from aline_tpu.ops.roles import NEG_INF
from aline_tpu.tasks.base import Batch, init_ctx_idx, select_design

STRATEGIES = ("aline", "random", "uncertainty")


def al_rollout_curves(model, params, batch: Batch, T: int, key: jax.Array,
                      strategy: str = "aline",
                      target_weights: jnp.ndarray = None,
                      time_token: bool = False) -> Dict[str, jnp.ndarray]:
    """Greedy/strategy rollout with per-step posterior-quality curves.

    Args:
        batch: freshly sampled task batch.
        target_weights: optional [n_target] weights for the targeted
            log-prob (e.g. from target_weight_vectors); defaults to the
            batch's target_mask normalized.

    Returns:
        dict with ``log_prob`` [B, T+1] and ``rmse`` [B, T+1]
        (step 0 = before any acquisition) and ``idx`` [B, T].
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}")
    # the eval mask is fixed for the whole rollout — derive the static
    # key-set specialization (ops/attention.py CompactKeys.ext_idx) from
    # it; exact, and skips dead target key columns (e.g. the 100 data
    # targets during a theta-mask eval)
    try:
        sel_targets = tuple(
            int(i) for i in np.flatnonzero(np.asarray(batch.target_mask)))
        if len(sel_targets) == int(batch.target_mask.shape[0]):
            sel_targets = None
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        sel_targets = None           # called under jit: generic path
    n_ctx0 = int(batch.ctx_mask[0].sum())
    batch = init_ctx_idx(batch, min(n_ctx0 + T, batch.n_points))
    target_vals = batch.target_all[..., 0]
    if target_weights is None:
        m = batch.target_mask.astype(jnp.float32)
        target_weights = m / jnp.maximum(m.sum(), 1.0)

    def posterior_metrics(out):
        po = out.posterior_out
        ll = gmm_log_prob(target_vals, po.mixture_means, po.mixture_stds,
                          po.mixture_weights)
        lp = jnp.sum(ll * target_weights[None], axis=-1)
        rmse = compute_rmse(target_vals, po.mixture_means, po.mixture_stds,
                            po.mixture_weights,
                            target_weights=target_weights)
        return lp, rmse

    def choose(out, b, k):
        if strategy == "aline":
            return out.design_out.idx
        pool = b.query_mask
        if strategy == "random":
            logits = jnp.where(pool, 0.0, NEG_INF)
            return jax.random.categorical(k, logits, axis=-1)
        # uncertainty sampling on the query-token GMM variance
        pq = out.posterior_out_query
        var = gmm_variance(pq.mixture_means, pq.mixture_stds,
                           pq.mixture_weights)               # [B, P]
        return jnp.argmax(jnp.where(pool, var, -jnp.inf), axis=-1)

    def step(carry, t):
        b, k = carry
        k, k_choice = jax.random.split(k)
        if time_token:
            b = b.replace(t=((T - t) / T).astype(jnp.float32))
        out = model.apply(params, b, training=False,
                          sel_targets=sel_targets)
        lp, rmse = posterior_metrics(out)
        idx = choose(out, b, k_choice)
        b2, _, _ = select_design(b, idx)
        return (b2, k), (lp, rmse, idx)

    (final_b, _), (lps, rmses, idxs) = jax.lax.scan(
        step, (batch, key), jnp.arange(T, dtype=jnp.float32))
    out = model.apply(params, final_b, training=False,
                      sel_targets=sel_targets)
    lp_f, rmse_f = posterior_metrics(out)
    return {
        "log_prob": jnp.concatenate(
            [jnp.swapaxes(lps, 0, 1), lp_f[:, None]], axis=1),
        "rmse": jnp.concatenate(
            [jnp.swapaxes(rmses, 0, 1), rmse_f[:, None]], axis=1),
        "idx": jnp.swapaxes(idxs.astype(jnp.int32), 0, 1),
    }


def compare_strategies(model, params, batch: Batch, T: int, key: jax.Array,
                       strategies=STRATEGIES, **kw):
    """Evaluate several acquisition strategies on the SAME batch
    (reference: notebooks/eval_al.ipynb cells 3-6)."""
    return {s: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x),
        al_rollout_curves(model, params, batch, T, key, strategy=s, **kw))
        for s in strategies}
