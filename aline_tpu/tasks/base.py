"""Task protocol and the static-shape experiment batch.

TPU-first redesign of the reference's mutable ``AttrDict`` batch
(reference: tasks/base_task.py:10-154).  The reference *moves* a chosen
query point from the query pool to the context (boolean-mask + reshape →
dynamic shapes every step, hostile to XLA).  Here the batch keeps one fixed
``[B, n_points, ...]`` buffer of candidate points for the whole rollout and
flips a per-point *context flag* instead:

* ``ctx_mask[b, i] == True``  → point i is currently context (y revealed),
* ``ctx_mask[b, i] == False`` → point i is still in the query pool.

"Selecting a design" is a single scatter into ``ctx_mask`` — shape-stable,
scan-compatible, and differentiable-through (the flag itself is boolean and
non-differentiable exactly like the reference's index selection).

Simulators are pure functions of an explicit PRNG key; the batch/contrastive
axes come from ``vmap``/broadcasting, not Python loops.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class Batch:
    """One batch of experiments with static shapes.

    Attributes:
        x:          [B, n_points, dim_x] all candidate design points
                    (initial context first, then the query pool).
        y:          [B, n_points, dim_y] pre-simulated outcomes for every
                    candidate (revealed to the model only once a point
                    becomes context — parity with the reference, which also
                    pre-simulates query outcomes in ``sample_batch``).
        ctx_mask:   [B, n_points] bool; True = currently context.
        target_x:   [B, n_target_data, dim_x] target input locations
                    (zero-width for theta-mode tasks).
        target_all: [B, n_target, 1] ground-truth values the posterior head
                    is scored on: target_y ++ theta (reference batch key
                    ``target_all``).
        theta:      task-natural latent shape (e.g. [B, K, D] for location
                    finding, [B, dim_x+1, 1] for GP) — used by EIG eval.
        target_mask:[n_target] bool — which targets the query tokens may
                    attend to this epoch (shared across batch, exactly as in
                    the reference).
        t:          [] float32 time-token scalar (0 when unused).
        ctx_capacity: STATIC upper bound on the context size for the
                    current rollout (n_context_init + T).  When positive it
                    enables the compact-key attention path
                    (:mod:`aline_tpu.ops.attention`); 0 = unknown → dense.
        ctx_idx:    optional [B, ctx_capacity] int32 buffer listing the
                    indices of context points in acquisition order (padded;
                    valid entries = per-row context count).  Maintained
                    incrementally by :func:`select_design`, so the compact
                    attention path needs no per-step sort.
    """
    x: jnp.ndarray
    y: jnp.ndarray
    ctx_mask: jnp.ndarray
    target_x: jnp.ndarray
    target_all: jnp.ndarray
    theta: Any
    target_mask: jnp.ndarray
    t: jnp.ndarray
    ctx_capacity: int = flax.struct.field(pytree_node=False, default=0)
    ctx_idx: Any = None

    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def n_points(self) -> int:
        return self.x.shape[1]

    @property
    def n_target_data(self) -> int:
        return self.target_x.shape[1]

    @property
    def n_target(self) -> int:
        return self.target_all.shape[1]

    @property
    def query_mask(self) -> jnp.ndarray:
        """[B, n_points] bool — points still available for acquisition."""
        return ~self.ctx_mask


def select_design(batch: Batch, idx: jnp.ndarray
                  ) -> Tuple[Batch, jnp.ndarray, jnp.ndarray]:
    """Move the chosen query points into the context.

    Replaces the reference's gather + pool-shrink + context-append
    (reference: tasks/base_task.py:133-154) with one scatter into the
    context flags (and, when present, an append into the incremental
    context index buffer used by compact attention).

    Args:
        batch: current batch.
        idx:   [B] int indices into the point axis.

    Returns:
        (updated batch, chosen x [B, dim_x], chosen y [B, dim_y])
    """
    b = jnp.arange(batch.batch_size)
    new_ctx = batch.ctx_mask.at[b, idx].set(True)
    new_ctx_idx = batch.ctx_idx
    if new_ctx_idx is not None:
        count = jnp.sum(batch.ctx_mask, axis=1)              # [B]
        slot = jnp.minimum(count, new_ctx_idx.shape[1] - 1)
        new_ctx_idx = new_ctx_idx.at[b, slot].set(
            idx.astype(new_ctx_idx.dtype))
    x_sel = batch.x[b, idx]
    y_sel = batch.y[b, idx]
    return batch.replace(ctx_mask=new_ctx, ctx_idx=new_ctx_idx), x_sel, y_sel


def init_ctx_idx(batch: Batch, capacity: int) -> Batch:
    """Attach the incremental context index buffer + capacity to a batch
    whose context is the first ``n`` points (the initial-batch layout every
    task produces)."""
    B = batch.batch_size
    idx = jnp.broadcast_to(
        jnp.arange(capacity, dtype=jnp.int32)[None], (B, capacity))
    return batch.replace(ctx_capacity=capacity, ctx_idx=idx)


class Task:
    """Base simulator: pure sampling + likelihood functions.

    Subclasses implement:
        * ``sample_theta(key, shape)``      → latent draws from the prior
        * ``simulate(key, x, theta)``       → outcomes y for designs x
        * ``log_likelihood(y, xi, theta)``  → pointwise log p(y | xi, theta),
          broadcastable over a leading contrastive axis L
          (reference: tasks/base_task.py:89-101)
        * ``sample_batch(key, batch_size, n_query=None)`` → Batch

    Design-space normalization follows the reference
    (tasks/base_task.py:58-72).
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.name = cfg.name
        self.dim_x = cfg.dim_x
        self.dim_y = cfg.dim_y
        self.embedding_type = cfg.embedding_type
        self.n_context_init = cfg.n_context_init
        self.n_query_init = cfg.n_query_init
        self.n_target_data = (cfg.n_target_data
                              if cfg.embedding_type in ("data", "mix") else 0)
        self.n_target_theta = (cfg.n_target_theta
                               if cfg.embedding_type in ("theta", "mix") else 0)
        self.design_scale = float(cfg.design_scale)

    # -- design space ------------------------------------------------------
    def to_design_space(self, xi):
        return xi * self.design_scale

    def normalise_design(self, x):
        return x / self.design_scale

    def unnormalise_design(self, x):
        return x * self.design_scale

    def normalise_outcomes(self, y):
        return y

    # -- abstract ----------------------------------------------------------
    def sample_theta(self, key: jax.Array, shape: Tuple[int, ...]):
        raise NotImplementedError

    def simulate(self, key: jax.Array, x: jnp.ndarray, theta) -> jnp.ndarray:
        """Simulate outcomes. x: [..., dim_x] (real design space),
        theta: task-natural shape broadcastable against x's batch dims."""
        raise NotImplementedError

    def log_likelihood(self, y, xi, theta):
        raise NotImplementedError

    def sample_batch(self, key: jax.Array, batch_size: int,
                     n_query: Optional[int] = None) -> Batch:
        raise NotImplementedError

    # -- helpers -----------------------------------------------------------
    def n_target(self) -> int:
        return self.n_target_data + self.n_target_theta

    def _initial_ctx_mask(self, batch_size: int, n_points: int) -> jnp.ndarray:
        m = jnp.zeros((batch_size, n_points), dtype=bool)
        return m.at[:, : self.n_context_init].set(True)

    def _pack_batch(self, x, y, target_x, target_y, theta_tokens, theta):
        """Assemble a Batch with mode-appropriate target_all.

        ``theta_tokens`` is theta reshaped to [B, n_target_theta, 1] (the
        per-token scalar values the GMM head predicts); ``theta`` keeps the
        task-natural shape for EIG evaluation.
        """
        B = x.shape[0]
        if self.embedding_type == "theta":
            target_all = theta_tokens
            target_x = jnp.zeros((B, 0, self.dim_x), x.dtype)
        elif self.embedding_type == "data":
            target_all = target_y
        else:  # mix
            target_all = jnp.concatenate([target_y, theta_tokens], axis=1)
        return Batch(
            x=x, y=y,
            ctx_mask=self._initial_ctx_mask(B, x.shape[1]),
            target_x=target_x,
            target_all=target_all,
            theta=theta,
            target_mask=jnp.ones((target_all.shape[1],), dtype=bool),
            t=jnp.zeros((), jnp.float32),
        )

    def __str__(self) -> str:
        fields = dataclasses.asdict(self.cfg)
        return (f"{type(self).__name__}("
                + ", ".join(f"{k}={v}" for k, v in fields.items()) + ")")
