"""Aline composition root: embedder → masked encoder → output head.

Capability parity with the reference ``Aline`` (reference: model/base.py:11-50).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aline_tpu.config import Config
from aline_tpu.models.embedder import Embedder
from aline_tpu.models.encoder import Encoder
from aline_tpu.models.heads import (
    AlineOutput,
    ContinuousOutputHead,
    OutputHead,
)
from aline_tpu.ops.attention import CompactKeys, context_indices
from aline_tpu.ops.roles import build_roles
from aline_tpu.tasks.base import Batch


class Aline(nn.Module):
    """Full model.  ``training`` toggles stochastic vs greedy design
    selection (the reference uses module train/eval mode,
    model/head.py:350-358); ``rng`` is the design-sampling key."""
    embedder: Embedder
    encoder: Encoder
    head: nn.Module

    def __call__(self, batch: Batch, *, training: bool = False,
                 rng: Optional[jax.Array] = None,
                 sel_targets: Optional[tuple] = None) -> AlineOutput:
        """``sel_targets``: static tuple of target-block indices equal to
        the True set of ``batch.target_mask`` — lets the compact attention
        path slice never-visible target key columns (exact; see
        ops/attention.py CompactKeys.ext_idx). None = generic path."""
        tokens = self.embedder(batch)
        n_target_tokens = tokens.shape[1] - batch.n_points
        with_time = self.encoder.cfg.with_time_token
        t_off = int(with_time)
        roles = build_roles(batch.ctx_mask, n_target_tokens,
                            batch.target_mask, with_time)
        compact = None
        impl = self.encoder.cfg.attention_impl
        if impl in ("compact", "auto") and batch.ctx_capacity > 0:
            if batch.ctx_idx is not None:
                # incrementally maintained index buffer (no per-step sort)
                count = jnp.sum(batch.ctx_mask, axis=1)
                valid = (jnp.arange(batch.ctx_capacity)[None]
                         < count[:, None])
                idx = batch.ctx_idx + t_off
            else:
                idx, valid = context_indices(batch.ctx_mask,
                                             batch.ctx_capacity, t_off)
            compact = CompactKeys(idx, valid, batch.n_points, t_off,
                                  sel_targets)
        z = self.encoder(tokens, roles, batch.t, compact=compact)
        return self.head(batch, z, training=training, rng=rng,
                         time_offset=t_off)


def build_model(cfg: Config) -> Aline:
    """Instantiate the model from config (the hydra-instantiate equivalent,
    reference: train_aline.py:246-249)."""
    # cfg.dtype (train-level) flows into the encoder group so one flag
    # switches the whole compute path to bfloat16
    if cfg.dtype != "float32":
        cfg.encoder.dtype = cfg.dtype
    dtype = jnp.dtype(cfg.encoder.dtype)
    embedder = Embedder(
        dim_x=cfg.task.dim_x,
        dim_y=cfg.task.dim_y,
        dim_embedding=cfg.encoder.dim_embedding,
        dim_feedforward=cfg.encoder.dim_feedforward,
        n_target_theta=(cfg.task.n_target_theta
                        if cfg.task.embedding_type in ("theta", "mix") else 0),
        embedding_type=cfg.task.embedding_type,
        continuous=cfg.embedder.continuous,
        dtype=dtype,
    )
    encoder = Encoder(cfg.encoder)
    head_cls = ContinuousOutputHead if cfg.head.continuous else OutputHead
    fused_gmm = {"auto": None, "on": True, "off": False}[
        cfg.head.fused_gmm]
    kwargs = dict(
        dim_x=cfg.task.dim_x,
        dim_y=cfg.task.dim_y,
        dim_embedding=cfg.encoder.dim_embedding,
        dim_feedforward=cfg.encoder.dim_feedforward,
        num_components=cfg.head.num_components,
        single_head=cfg.head.single_head,
        std_min=cfg.head.std_min,
        time_token=cfg.time_token,
        dtype=dtype,
        fused_gmm=fused_gmm,
    )
    if cfg.head.continuous:
        kwargs["policy_log_std_min"] = cfg.head.policy_log_std_min
        kwargs["policy_log_std_max"] = cfg.head.policy_log_std_max
    else:
        kwargs["value_head"] = cfg.head.value_head
    head = head_cls(**kwargs)
    return Aline(embedder=embedder, encoder=encoder, head=head)
