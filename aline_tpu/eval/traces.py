"""Greedy no-grad rollout tracer for evaluation.

Capability parity with the reference ``get_traces``
(reference: utils/eval.py:8-39): run the model greedily for T steps and
return (theta_0, designs, outcomes).  As in the reference, the returned
history INCLUDES the initial context points in front (the reference reads
``batch.context_x`` after T updates, which contains n_context_init + T
points), and the time token runs BACKWARDS, (T-t)/T — the reference's
documented train/eval direction mismatch (SURVEY.md §7 quirk list),
reproduced faithfully.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aline_tpu.tasks.base import Batch, init_ctx_idx
from aline_tpu.train.rollout import rollout


def get_traces(model, params, task, batch: Batch, T: int,
               key: jax.Array, time_token: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Roll out greedily and collect the experiment history.

    Returns:
        theta_0: [B, ...] task-natural latents of the rolled-out batch.
        x:       [B, n_context_init + T, dim_x] UNNORMALIZED design history
                 (initial context first, then chosen designs in order).
        y:       [B, n_context_init + T, dim_y] outcome history.
    """
    n_ctx = task.n_context_init
    batch = init_ctx_idx(batch, min(n_ctx + T, batch.n_points))
    zero_w = jnp.zeros((batch.n_target,), jnp.float32)
    ro = rollout(model, params, batch, T, zero_w, zero_w, key,
                 training=False, time_token=time_token, time_forward=False,
                 use_remat=False)
    init_x = batch.x[:, :n_ctx]
    init_y = batch.y[:, :n_ctx]
    xs = jnp.concatenate([init_x, jnp.swapaxes(ro.xs, 0, 1)], axis=1)
    ys = jnp.concatenate([init_y, jnp.swapaxes(ro.ys, 0, 1)], axis=1)
    return batch.theta, task.unnormalise_design(xs), ys
