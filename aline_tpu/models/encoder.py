"""Masked set-transformer encoder.

Capability parity with the reference ``Encoder``
(reference: model/encoder.py:48-141): a stack of post-norm transformer
layers (torch ``TransformerEncoderLayer`` semantics: attn → add → norm →
relu-FF → add → norm) whose attention obeys the ALINE role mask.

TPU-first differences:
* the attention mask is derived from per-token role flags
  (:mod:`aline_tpu.ops.roles`) instead of being rebuilt host-side every
  rollout step (reference :139),
* the attention core is pluggable: an XLA einsum path with an explicit
  bias for small sequences, or the Pallas block-masked flash kernel for
  long ones (reference's ``EfficientTransformerEncoderLayer`` block
  decomposition, :7-46, generalized to block-sparse tiles).
* the optional global time token (reference ``EncoderWithTime``,
  :144-223, not wired into any reference config) is a first-class flag.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aline_tpu.config import EncoderConfig
from aline_tpu.ops.attention import (
    CompactKeys,
    compact_attention,
    dense_bias_attention,
)
from aline_tpu.ops.roles import Roles, attention_bias


class MultiHeadSelfAttention(nn.Module):
    """MHA with a pluggable masked-attention core: dense additive-bias,
    compact-key gather, or the Pallas fused kernel
    (see aline_tpu.ops.attention / aline_tpu.ops.flash_attention)."""
    dim_embedding: int
    n_head: int
    impl: str = "naive"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, roles: Roles,
                 bias: jnp.ndarray = None,
                 compact: CompactKeys = None) -> jnp.ndarray:
        B, N, D = x.shape
        H = self.n_head
        dh = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype,
                       name="qkv_proj")(x)                   # [B, N, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        if compact is not None:
            out = compact_attention(q, k, v, roles, compact)
        elif self.impl == "flash":
            from aline_tpu.ops.flash_attention import (
                flash_role_attention, roles_to_codes)
            kcode, qrow = roles_to_codes(roles)
            interpret = jax.default_backend() != "tpu"
            out = flash_role_attention(q, k, v, kcode, qrow, interpret)
        else:
            out = dense_bias_attention(q, k, v, bias)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype,
                        name="out_proj")(out.astype(self.dtype))


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (torch TransformerEncoderLayer
    defaults: norm_first=False, relu activation)."""
    dim_embedding: int
    dim_feedforward: int
    n_head: int
    dropout: float
    impl: str = "naive"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, roles: Roles,
                 bias: jnp.ndarray = None, compact: CompactKeys = None,
                 deterministic: bool = True) -> jnp.ndarray:
        sa = MultiHeadSelfAttention(self.dim_embedding, self.n_head,
                                    self.impl, self.dtype,
                                    name="self_attn")(x, roles, bias,
                                                      compact)
        sa = nn.Dropout(self.dropout, deterministic=deterministic)(sa)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + sa)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                      name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        ff = nn.Dense(self.dim_embedding, dtype=self.dtype,
                      name="linear2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + ff)


class Encoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, roles: Roles,
                 t: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 compact: CompactKeys = None) -> jnp.ndarray:
        """Encode the packed token sequence under the role mask.

        Args:
            tokens: [B, N, D] (without the time token).
            roles:  role flags (already sized for the time token if used).
            t:      [] time scalar; required when with_time_token.
            compact: context gather plan → compact-key attention path.
        Returns:
            [B, N(+1 if time), D] encoded tokens (time token first if used).
        """
        dtype = jnp.dtype(self.cfg.dtype)
        if self.cfg.with_time_token:
            B = tokens.shape[0]
            t_emb = nn.Dense(self.cfg.dim_embedding, dtype=dtype,
                             name="time_proj")(
                jnp.reshape(t, (1, 1)).astype(tokens.dtype))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(t_emb[None],
                                  (B, 1, self.cfg.dim_embedding)), tokens],
                axis=1)
        impl = self.cfg.attention_impl
        bias = None
        if compact is None and impl != "flash":
            bias = attention_bias(roles, tokens.dtype)       # [B, 1, N, N]
        x = tokens
        for i in range(self.cfg.num_layers):
            x = EncoderLayer(self.cfg.dim_embedding, self.cfg.dim_feedforward,
                             self.cfg.n_head, self.cfg.dropout, impl, dtype,
                             name=f"layer_{i}")(x, roles, bias, compact,
                                                deterministic)
        return x
