"""Two-phase optimizer with burning-stage layerwise learning rates.

Reproduces the reference training schedule (reference: utils/misc.py:137-171
and train_aline.py:141-151):

* burning phase (epoch < burning_epoch): AdamW, one cosine-annealed LR over
  ``max_epoch`` steps;
* after burning the optimizer is REBUILT (Adam moments reset, cosine restarts
  over ``max_epoch - burning_epoch`` steps) with the shared layers — every
  parameter whose path does NOT contain ``predictor`` — at lr/5.

Gradient clipping uses the infinity norm at 1.0
(reference: train_aline.py:137-138, torch clip_grad_norm_ norm_type="inf").
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

# torch AdamW defaults (reference instantiates getattr(optim, "AdamW")
# with only lr set): betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01.
_ADAMW_KW = dict(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)


def clip_by_inf_norm(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_(..., norm_type=inf) semantics:
    scale all grads by max_norm / (||g||_inf + 1e-6) when above max_norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree_util.tree_leaves(updates)
        norm = jnp.max(jnp.asarray(
            [jnp.max(jnp.abs(g)) for g in leaves])) if leaves else 0.0
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _cosine(lr: float, decay_steps: int, warmup: int = 0) -> optax.Schedule:
    """torch CosineAnnealingLR with eta_min=0:
    lr_t = lr * (1 + cos(pi * t / T_max)) / 2.

    ``warmup`` > 0 prepends a linear 0→lr ramp (not in the reference;
    used when warm-starting from trained params, where fresh Adam
    moments at full lr jolt the params off the loaded optimum)."""
    if warmup > 0:
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(decay_steps, warmup + 1))
    return optax.cosine_decay_schedule(lr, max(decay_steps, 1), alpha=0.0)


def predictor_partition(params) -> dict:
    """Label each parameter 'predictor' or 'shared' by path substring
    (reference partition: 'predictor' in parameter name,
    utils/misc.py:154-159)."""

    def label(path, _):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        return "predictor" if "predictor" in keys else "shared"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg, params, phase: str
                    ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the optimizer for 'burning' or 'main' phase.

    Returns (tx, lr_schedule-of-the-predictor-group) — the schedule is
    exposed for logging.
    """
    if cfg.optimizer.lower() != "adamw":
        raise ValueError(f"unsupported optimizer {cfg.optimizer!r}")
    clip = (clip_by_inf_norm(1.0) if cfg.clip_grads
            else optax.identity())
    warmup = int(getattr(cfg, "lr_warmup", 0))
    if phase == "burning":
        sched = _cosine(cfg.lr, cfg.max_epoch, warmup)
        tx = optax.chain(clip, optax.adamw(sched, **_ADAMW_KW))
        return tx, sched
    if phase == "main":
        steps = cfg.max_epoch - cfg.burning_epoch
        sched_pred = _cosine(cfg.lr, steps, warmup)
        sched_shared = _cosine(cfg.lr / 5.0, steps, warmup)
        tx = optax.chain(clip, optax.multi_transform(
            {"predictor": optax.adamw(sched_pred, **_ADAMW_KW),
             "shared": optax.adamw(sched_shared, **_ADAMW_KW)},
            predictor_partition(params)))
        return tx, sched_pred
    raise ValueError(f"unknown phase {phase!r}")


def phase_for_epoch(cfg, epoch: int) -> str:
    return "burning" if epoch < cfg.burning_epoch else "main"
