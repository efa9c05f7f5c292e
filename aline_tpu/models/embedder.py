"""Token embedder for the three ALINE operation modes.

Capability parity with the reference ``Embedder``
(reference: model/embedder.py:6-214): two shared 2-layer MLPs embed x and y;
context tokens get x+y, query tokens x only, target-data tokens x only,
and theta targets are learnable per-dimension tokens.

TPU-first difference: the sequence layout is
``[points (initial context + query pool) | target_data | theta]`` with the
context/query distinction carried by ``Batch.ctx_mask`` — y embeddings are
added under that flag, so one fixed-shape computation serves every rollout
step (the reference re-concatenates shrunken/grown segments per step).
Attention is permutation-equivariant over the set (no positional encoding),
so the layout change is behavior-preserving.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from aline_tpu.tasks.base import Batch


class MLPEmbed(nn.Module):
    """Linear → ReLU → Linear (reference: model/embedder.py:47-57)."""
    dim_feedforward: int
    dim_embedding: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.dim_embedding, dtype=self.dtype,
                        name="fc2")(nn.relu(h))


class Embedder(nn.Module):
    dim_x: int
    dim_y: int
    dim_embedding: int
    dim_feedforward: int
    n_target_theta: int = 0
    embedding_type: str = "data"
    # ContinuousEmbedder variant: the query-pool slots are replaced by a
    # single learnable design token (reference: model/embedder.py:218-301).
    continuous: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.embedding_type in ("theta", "mix"):
            if self.n_target_theta <= 0:
                raise ValueError(
                    "n_target_theta must be positive for theta or mix "
                    "embedding type (reference: model/embedder.py:60-62)")
            self.theta_tokens = self.param(
                "theta_tokens", nn.initializers.normal(1.0),
                (self.n_target_theta, self.dim_embedding))
        if self.continuous:
            self.query_token = self.param(
                "query_token", nn.initializers.normal(1.0),
                (1, self.dim_embedding))
        self.x_embedder = MLPEmbed(self.dim_feedforward, self.dim_embedding,
                                   self.dtype, name="x_embedder")
        self.y_embedder = MLPEmbed(self.dim_feedforward, self.dim_embedding,
                                   self.dtype, name="y_embedder")

    def __call__(self, batch: Batch) -> jnp.ndarray:
        """Embed a batch into [B, N, D] tokens.

        N = n_points + n_target_data (data/mix) + n_target_theta (theta/mix).
        """
        B = batch.batch_size
        batch = batch.replace(x=batch.x.astype(self.dtype),
                              y=batch.y.astype(self.dtype))
        pts = self.x_embedder(batch.x)                        # [B, P, D]
        y_emb = self.y_embedder(batch.y)                      # [B, P, D]
        # context tokens carry x+y; pool tokens x only (reference :97-126)
        pts = pts + y_emb * batch.ctx_mask[..., None].astype(pts.dtype)
        if self.continuous:
            # pool slots become the learned design token (reference :283-285)
            pts = jnp.where(batch.ctx_mask[..., None], pts,
                            self.query_token[None].astype(pts.dtype))
        segments = [pts]
        if self.embedding_type in ("data", "mix"):
            segments.append(self.x_embedder(batch.target_x))
        if self.embedding_type in ("theta", "mix"):
            segments.append(jnp.broadcast_to(
                self.theta_tokens[None],
                (B, self.n_target_theta, self.dim_embedding)
            ).astype(pts.dtype))
        return jnp.concatenate(segments, axis=1)
