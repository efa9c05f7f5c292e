"""On-device T-step experiment rollout as a single ``lax.scan``.

Replaces the reference's Python rollout loop (reference:
train_aline.py:80-110): per step the model proposes a design, the chosen
point's pre-simulated outcome joins the context, and two NLL streams are
recorded (masked targets → reward signal, all targets → prediction loss).
The whole trajectory is differentiable end-to-end; ``remat`` bounds the
backward-pass memory to one step's activations.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aline_tpu.distributions.gmm import gmm_log_prob
from aline_tpu.tasks.base import Batch, select_design


class RolloutOutputs(NamedTuple):
    log_probs: jnp.ndarray   # [T, B] design log-probs
    nll_query: jnp.ndarray   # [T, B] masked-target NLL (reward stream)
    nll_pred: jnp.ndarray    # [T, B] all-target NLL (prediction stream)
    idx: jnp.ndarray         # [T, B] chosen point indices
    xs: jnp.ndarray          # [T, B, dim_x] chosen designs (normalized)
    ys: jnp.ndarray          # [T, B, dim_y] observed outcomes
    final_ctx_mask: jnp.ndarray  # [B, n_points]


def rollout(model, params, batch: Batch, T: int, w_query: jnp.ndarray,
            w_pred: jnp.ndarray, key: jax.Array, *, training: bool,
            time_token: bool = False, time_forward: bool = True,
            use_remat: bool = True, remat_policy: str = "full",
            unroll: int = 1,
            sel_targets: tuple = None) -> RolloutOutputs:
    """Run T acquisition steps.

    Args:
        w_query/w_pred: [n_target] NLL weight vectors
            (:func:`aline_tpu.ops.target_mask.target_weight_vectors`).
        training: stochastic design sampling + differentiable NLLs
            (reference model.train()), else greedy argmax.
        time_token: feed the time scalar to the heads.
        time_forward: t/T (training convention, reference
            train_aline.py:82); False → (T-t)/T (eval convention,
            reference utils/eval.py:26 — the reference's documented
            direction mismatch, reproduced faithfully per mode).
        use_remat: checkpoint each step's activations for the backward pass.
        remat_policy: 'full' (recompute everything) or 'dots' (save matmul
            outputs, recompute elementwise — trades a little rollout memory
            for less backward-pass recompute).
        unroll: lax.scan unroll factor (XLA fuses across unrolled steps).
        sel_targets: static tuple of attendable target indices (the True
            set of batch.target_mask) for the compact-attention key-set
            specialization; None = generic path. Exact either way.
    """
    target_vals = batch.target_all[..., 0]                   # [B, n_target]

    def step(carry, t):
        # the carry holds ALL per-step batch state: the context flags AND
        # the incremental context index buffer of the compact-attention
        # path (leaving ctx_idx out of the carry silently freezes the
        # attended key set at its initial value)
        ctx_mask, ctx_idx, k = carry
        k, k_design = jax.random.split(k)
        if time_token:
            tt = ((t / T) if time_forward else ((T - t) / T)).astype(
                jnp.float32)
        else:
            tt = jnp.zeros((), jnp.float32)
        b = batch.replace(ctx_mask=ctx_mask, ctx_idx=ctx_idx, t=tt)
        out = model.apply(params, b, training=training, rng=k_design,
                          sel_targets=sel_targets)
        b2, x_sel, y_sel = select_design(b, out.design_out.idx)
        ll = gmm_log_prob(target_vals,
                          out.posterior_out.mixture_means,
                          out.posterior_out.mixture_stds,
                          out.posterior_out.mixture_weights)  # [B, n_target]
        nll_q = -jnp.sum(ll * w_query, axis=-1)
        nll_p = -jnp.sum(ll * w_pred, axis=-1)
        ys = (out.design_out.log_prob, nll_q, nll_p, out.design_out.idx,
              x_sel, y_sel)
        return (b2.ctx_mask, b2.ctx_idx, k), ys

    if use_remat:
        if remat_policy == "dots":
            step = jax.checkpoint(
                step,
                policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
        else:
            step = jax.checkpoint(step)

    (final_ctx, _, _), (log_probs, nll_q, nll_p, idx, xs, ys) = jax.lax.scan(
        step, (batch.ctx_mask, batch.ctx_idx, key),
        jnp.arange(T, dtype=jnp.float32), unroll=unroll)
    return RolloutOutputs(log_probs, nll_q, nll_p, idx, xs, ys, final_ctx)
