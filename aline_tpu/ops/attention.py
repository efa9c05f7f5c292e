"""Attention implementations for the ALINE role mask.

Three interchangeable paths (selected by ``EncoderConfig.attention_impl``):

* ``naive``   — dense [B,H,N,N] scores with an explicit additive bias.
                Ground truth for tests; fine for small N.
* ``compact`` — TPU-first reformulation exploiting the ALINE mask
                structure: every row may attend ONLY to (a) the current
                context points (at most ``ctx_capacity`` = n_ctx_init + T
                of them) and (b) the selected target / time tokens (query
                rows only).  Keys/values are gathered into a compact
                [B, H, Ck + n_target(+1), dh] buffer, shrinking the score
                matrix by N / (Ck + n_target) — ~15x at evaluation scale
                (N≈2100, keys≈40).  This generalizes the reference's
                ``EfficientTransformerEncoderLayer`` block decomposition
                (reference: model/encoder.py:7-46) to the static-pool
                layout, and is exact: softmax over a superset of -inf
                columns equals softmax over the gathered columns.
* ``flash``   — Pallas fused kernel (see aline_tpu.ops.flash_attention).

The compact path needs the context gather indices; :func:`context_indices`
derives them from the flags with one stable argsort.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from aline_tpu.ops.roles import NEG_INF, Roles


class CompactKeys(NamedTuple):
    """Gather plan for compact attention over the packed sequence
    [time? | points | targets]."""
    ctx_idx: jnp.ndarray    # [B, Ck] indices of context tokens (padded)
    ctx_valid: jnp.ndarray  # [B, Ck] bool
    n_points: int
    time_offset: int        # 1 when a global time token leads the sequence
    # Static tuple of target-block indices that are attendable this step
    # (the True set of the epoch's target mask). When given, only these
    # columns join the compact key set; the dropped columns are masked to
    # -1e9 for every row anyway (exp underflows to exactly 0.0), so the
    # slicing is numerically exact. None = keep all target columns.
    ext_idx: "Tuple[int, ...]" = None


def context_indices(ctx_mask: jnp.ndarray, capacity: int,
                    time_offset: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of context points, padded to ``capacity``.

    A stable argsort of ~ctx_mask lists context points first in index
    order; entries beyond the per-row context count are invalid.
    """
    order = jnp.argsort(~ctx_mask, axis=1, stable=True)      # ctx first
    idx = order[:, :capacity] + time_offset
    count = jnp.sum(ctx_mask, axis=1)
    valid = jnp.arange(capacity)[None, :] < count[:, None]
    return idx, valid


def dense_bias_attention(q, k, v, bias):
    """Reference dense path.  q/k/v: [B, H, N, dh]; bias: [B, 1, N, N].

    Scores accumulate in f32 and the softmax runs in f32 regardless of the
    compute dtype (bf16-safe)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(
        jnp.float32) / math.sqrt(dh)
    attn = jax.nn.softmax(scores + bias.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(q.dtype), v)


def compact_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      roles: Roles, compact: CompactKeys) -> jnp.ndarray:
    """Exact ALINE-masked attention over the compact key set.

    Args:
        q/k/v: [B, H, N, dh] projected heads over the full sequence.
        roles: role flags over the full sequence.
        compact: context gather plan.

    Returns:
        [B, H, N, dh] attention output for every row.
    """
    B, H, N, dh = q.shape
    n_pts, t_off = compact.n_points, compact.time_offset
    tgt_start = t_off + n_pts

    # ---- gather compact keys/values via one-hot matmul -------------------
    # (a gather lowers to slow serialized TPU scatter in the VJP; a one-hot
    #  einsum runs on the MXU forward AND backward)
    Ck = compact.ctx_idx.shape[1]
    onehot = (compact.ctx_idx[:, :, None]
              == jnp.arange(N)[None, None, :]).astype(q.dtype)  # [B,Ck,N]
    onehot = onehot * compact.ctx_valid[:, :, None].astype(q.dtype)
    k_ctx = jnp.einsum("bkn,bhnd->bhkd", onehot, k)          # [B,H,Ck,dh]
    v_ctx = jnp.einsum("bkn,bhnd->bhkd", onehot, v)
    k_ext = k[:, :, tgt_start:]                              # targets
    v_ext = v[:, :, tgt_start:]
    ext_cols_src = roles.k_is_sel[:, tgt_start:]             # [B, Nt]
    if compact.ext_idx is not None:
        # static specialization: keep only the attendable target columns
        sel = list(compact.ext_idx)
        k_ext = k_ext[:, :, sel]
        v_ext = v_ext[:, :, sel]
        ext_cols_src = ext_cols_src[:, sel]
    if t_off:                                                # time token col
        k_ext = jnp.concatenate([k[:, :, :1], k_ext], axis=2)
        v_ext = jnp.concatenate([v[:, :, :1], v_ext], axis=2)
    K = jnp.concatenate([k_ctx, k_ext], axis=2)              # [B,H,Nk,dh]
    V = jnp.concatenate([v_ctx, v_ext], axis=2)

    # ---- bias over compact columns ---------------------------------------
    neg = jnp.asarray(NEG_INF, jnp.float32)
    # context columns: visible to every row when within the live count
    ctx_bias = jnp.where(compact.ctx_valid, 0.0, neg)        # [B, Ck]
    ctx_bias = ctx_bias[:, None, None, :]                    # [B,1,1,Ck]
    # extra columns (targets ± time): visible to query rows where selected
    ext_cols = ext_cols_src                                  # [B, Ne']
    if t_off:
        ext_cols = jnp.concatenate(
            [jnp.ones((B, 1), bool), ext_cols], axis=1)      # [B, Ne]
    q_rows = roles.q_is_query                                # [B, N]
    ext_bias = jnp.where(q_rows[:, :, None] & ext_cols[:, None, :],
                         0.0, neg)                           # [B, N, Ne]
    bias = jnp.concatenate(
        [jnp.broadcast_to(ctx_bias, (B, 1, N, ctx_bias.shape[-1])),
         ext_bias[:, None]], axis=-1)                        # [B,1,N,Nk]

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, K).astype(
        jnp.float32) / math.sqrt(dh)
    attn = jax.nn.softmax(scores + bias.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(q.dtype), V)
