"""Continuous-design (DAD-style) rollouts for the Gaussian-policy head.

The reference ships ``ContinuousEmbedder`` / ``ContinuousOutputHead``
(reference: model/embedder.py:218-301, model/head.py:396-495) but does not
wire them into a training path (SURVEY.md §7 quirk list) — here the wiring
is provided: a static-shape rollout where each step the model EMITS a
design xi (instead of choosing a pool candidate), the simulator produces
the outcome, and the (xi, y) pair is appended to the context buffer.

Batch layout: ``x``/``y`` buffers of width n_ctx_init + T + 1; the first
n_ctx_init slots are the initial context, the next T slots are filled as
the rollout proceeds, and the LAST slot is the permanent query-token slot
that the continuous embedder replaces with its learned design token.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aline_tpu.distributions.gmm import gmm_log_prob
from aline_tpu.tasks.base import Batch, Task


class ContinuousRollout(NamedTuple):
    log_probs: jnp.ndarray   # [T, B] Gaussian policy log-probs
    nll_query: jnp.ndarray   # [T, B]
    nll_pred: jnp.ndarray    # [T, B]
    xs: jnp.ndarray          # [T, B, dim_x] emitted designs (normalized)
    ys: jnp.ndarray          # [T, B, dim_y]
    stds: jnp.ndarray        # [T, B, dim_x] policy exploration stds


def make_continuous_batch(task: Task, key: jax.Array, batch_size: int,
                          T: int) -> Batch:
    """Initial batch for a continuous rollout: sampled initial context,
    T empty growth slots, and the trailing query slot."""
    k_theta, k_x, k_y = jax.random.split(key, 3)
    theta = task.sample_theta(k_theta, (batch_size,))
    n_ctx0 = task.n_context_init
    x_ctx = task.sample_data(k_x, batch_size, n_ctx0)
    y_ctx = task.simulate(k_y, task.unnormalise_design(x_ctx),
                          theta[:, None])
    P = n_ctx0 + T + 1
    x = jnp.zeros((batch_size, P, task.dim_x), x_ctx.dtype)
    x = x.at[:, :n_ctx0].set(x_ctx)
    y = jnp.zeros((batch_size, P, task.dim_y), y_ctx.dtype)
    y = y.at[:, :n_ctx0].set(y_ctx)
    ctx = jnp.zeros((batch_size, P), bool).at[:, :n_ctx0].set(True)
    theta_tokens = theta.reshape(batch_size, task.n_target_theta, 1)
    return Batch(
        x=x, y=y, ctx_mask=ctx,
        target_x=jnp.zeros((batch_size, 0, task.dim_x), x.dtype),
        target_all=theta_tokens, theta=theta,
        target_mask=jnp.ones((task.n_target_theta,), bool),
        t=jnp.zeros((), jnp.float32))


def rollout_continuous(model, params, task: Task, batch: Batch, T: int,
                       w_query: jnp.ndarray, w_pred: jnp.ndarray,
                       key: jax.Array, *, training: bool,
                       time_token: bool = False,
                       use_remat: bool = True) -> ContinuousRollout:
    """T steps of emit-design → simulate → append-to-context."""
    n_ctx0 = task.n_context_init
    target_vals = batch.target_all[..., 0]

    def step(carry, t):
        x_buf, y_buf, ctx, k = carry
        k, k_design, k_sim = jax.random.split(k, 3)
        tt = (t / T).astype(jnp.float32) if time_token \
            else jnp.zeros((), jnp.float32)
        b = batch.replace(x=x_buf, y=y_buf, ctx_mask=ctx, t=tt)
        out = model.apply(params, b, training=training, rng=k_design)
        xi = out.design_out.xi[:, 0]                         # [B, dim_x]
        y = task.simulate(k_sim, task.unnormalise_design(xi),
                          batch.theta)                       # [B, 1]
        slot = n_ctx0 + t.astype(jnp.int32)
        bsel = jnp.arange(x_buf.shape[0])
        x_buf = x_buf.at[bsel, slot].set(xi)
        y_buf = y_buf.at[bsel, slot].set(y)
        ctx = ctx.at[bsel, slot].set(True)
        ll = gmm_log_prob(target_vals,
                          out.posterior_out.mixture_means,
                          out.posterior_out.mixture_stds,
                          out.posterior_out.mixture_weights)
        nll_q = -jnp.sum(ll * w_query, axis=-1)
        nll_p = -jnp.sum(ll * w_pred, axis=-1)
        return (x_buf, y_buf, ctx, k), (out.design_out.log_prob,
                                        nll_q, nll_p, xi, y,
                                        out.design_out.std[:, 0])

    if use_remat:
        step = jax.checkpoint(step)
    (_, _, _, _), (lps, nq, np_, xs, ys, stds) = jax.lax.scan(
        step, (batch.x, batch.y, batch.ctx_mask, key),
        jnp.arange(T, dtype=jnp.float32))
    return ContinuousRollout(lps, nq, np_, xs, ys, stds)
