"""Numerically safe reductions for sharded contrastive evaluation.

The sPCE/sNMC bounds need ``logsumexp`` over up to L = 1e7 contrastive
samples (reference: loss/eig.py:174-208 accumulates a dense [L+1, M]
tensor on one device).  Here L is processed in chunks — and across devices
— as streaming (max, sum-of-shifted-exp) pairs that combine associatively,
so any chunking/sharding of L yields bit-stable results up to float
rounding.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LogSumExpState(NamedTuple):
    """Running logsumexp accumulator: logsumexp = max + log(sumexp)."""
    max: jnp.ndarray      # running maximum
    sumexp: jnp.ndarray   # sum of exp(x - max)


def lse_init(shape, dtype=jnp.float32) -> LogSumExpState:
    return LogSumExpState(jnp.full(shape, -jnp.inf, dtype),
                          jnp.zeros(shape, dtype))


def lse_update(state: LogSumExpState, chunk: jnp.ndarray,
               axis: int = 0) -> LogSumExpState:
    """Fold a chunk (reduced over ``axis``) into the running accumulator."""
    chunk_max = jnp.max(chunk, axis=axis)
    new_max = jnp.maximum(state.max, chunk_max)
    # guard: exp(-inf - -inf) when everything is -inf
    safe_new = jnp.where(jnp.isfinite(new_max), new_max, 0.0)
    scaled_old = state.sumexp * jnp.exp(
        jnp.where(jnp.isfinite(state.max), state.max - safe_new, -jnp.inf))
    scaled_chunk = jnp.sum(
        jnp.exp(chunk - jnp.expand_dims(safe_new, axis)), axis=axis)
    return LogSumExpState(new_max, scaled_old + scaled_chunk)


def lse_value(state: LogSumExpState) -> jnp.ndarray:
    return state.max + jnp.log(state.sumexp)


def streaming_logsumexp_combine(state_a: LogSumExpState,
                                state_b: LogSumExpState) -> LogSumExpState:
    """Associative combine of two accumulators (cross-chunk / cross-device)."""
    new_max = jnp.maximum(state_a.max, state_b.max)
    safe = jnp.where(jnp.isfinite(new_max), new_max, 0.0)
    sa = state_a.sumexp * jnp.exp(
        jnp.where(jnp.isfinite(state_a.max), state_a.max - safe, -jnp.inf))
    sb = state_b.sumexp * jnp.exp(
        jnp.where(jnp.isfinite(state_b.max), state_b.max - safe, -jnp.inf))
    return LogSumExpState(new_max, sa + sb)


def sharded_logsumexp(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """logsumexp over the local leading axis AND the named mesh axis.

    For use inside ``shard_map`` over the contrastive mesh axis: each device
    reduces its local shard, then a max-shifted psum combines shards
    (SURVEY.md §5.8).
    """
    local_max = jnp.max(x, axis=0)
    global_max = jax.lax.pmax(local_max, axis_name)
    safe = jnp.where(jnp.isfinite(global_max), global_max, 0.0)
    local_sum = jnp.sum(jnp.exp(x - safe[None]), axis=0)
    total = jax.lax.psum(local_sum, axis_name)
    return global_max + jnp.log(total)
