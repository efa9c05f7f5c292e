"""Token role flags for the ALINE attention pattern.

The reference rebuilds an additive [N, N] attention mask from the batch's
context/query/target segments at EVERY rollout step
(reference: model/encoder.py:83-126, called per forward at :139).  Here the
mask is fully determined by three cheap per-token flag vectors that update
with the context flags — the [B, N, N] bias (or the in-kernel block mask of
the Pallas path) is derived from them on the fly:

    allowed[b, i, j] =  k_is_ctx[b, j]
                     | (q_is_query[b, i] & k_is_sel[b, j])
                     | (q_is_query[b, i] & k_is_time[j])        (time token)

which reproduces the reference mask exactly:
  * every row attends to all context columns (reference :107),
  * query rows additionally attend to the selected target columns
    (reference :110-121) and the optional global time token
    (reference :196-199),
  * queries do not attend each other or themselves; targets attend only
    context.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NEG_INF = -1e9  # large-negative instead of -inf: keeps softmax NaN-free


class Roles(NamedTuple):
    """Per-token attention role flags over the packed sequence
    [time? | points | target_data | theta]."""
    q_is_query: jnp.ndarray   # [B, N] row may attend targets/time
    k_is_ctx: jnp.ndarray     # [B, N] column visible to everyone
    k_is_sel: jnp.ndarray     # [B, N] column is a selected target
    k_is_time: jnp.ndarray    # [N]    column is the global time token


def build_roles(ctx_mask: jnp.ndarray, n_target: int,
                target_mask: jnp.ndarray,
                with_time_token: bool = False) -> Roles:
    """Build role flags for a batch.

    Args:
        ctx_mask:    [B, n_points] current context flags.
        n_target:    number of target tokens (target_data + theta).
        target_mask: [n_target] bool — selected targets this epoch.
        with_time_token: prepend a global time-token slot at index 0.
    """
    B, n_points = ctx_mask.shape
    n_time = 1 if with_time_token else 0
    N = n_time + n_points + n_target

    zeros_b = jnp.zeros((B, n_time), dtype=bool)
    zeros_t = jnp.zeros((B, n_target), dtype=bool)

    q_is_query = jnp.concatenate(
        [zeros_b, ~ctx_mask, zeros_t], axis=1)
    k_is_ctx = jnp.concatenate(
        [zeros_b, ctx_mask, zeros_t], axis=1)
    k_is_sel = jnp.concatenate(
        [zeros_b, jnp.zeros((B, n_points), bool),
         jnp.broadcast_to(target_mask[None], (B, n_target))], axis=1)
    k_is_time = jnp.zeros((N,), bool).at[0].set(bool(n_time)) \
        if n_time else jnp.zeros((N,), bool)
    return Roles(q_is_query, k_is_ctx, k_is_sel, k_is_time)


def attention_bias(roles: Roles, dtype=jnp.float32) -> jnp.ndarray:
    """Materialized additive bias [B, 1, N, N] (naive / small-N path)."""
    allowed = (roles.k_is_ctx[:, None, :]
               | (roles.q_is_query[:, :, None] & roles.k_is_sel[:, None, :])
               | (roles.q_is_query[:, :, None]
                  & roles.k_is_time[None, None, :]))
    return jnp.where(allowed, jnp.asarray(0.0, dtype),
                     jnp.asarray(NEG_INF, dtype))[:, None]
