"""Pallas fused role-masked attention for TPU.

The ALINE attention mask (reference: model/encoder.py:83-126) is a function
of two per-token codes, so the kernel computes it on the fly from two tiny
integer vectors instead of reading an [N, N] bias from HBM:

    kcode[b, j] ∈ {0: invisible, 1: context (visible to every row),
                   2: query-visible (selected target / time token)}
    qrow[b, i]  ∈ {0, 1}: row i is a live query row

    allowed(i, j) = kcode[j] == 1  or  (qrow[i] and kcode[j] == 2)

Compared to the XLA dense path this kernel never materializes the
[B, H, N, N] score tensor in HBM — scores live in VMEM per (batch,
q-block) tile with the full K/V resident in VMEM, Heads occupy their own
grid dimension so each cell holds one [bq, N] score tile in VMEM (an
unrolled head loop quadruples live VMEM and fails to compile at the
model's eval scale N≈2048).  The backward pass is a second kernel using
the saved row logsumexp, with dK/dV accumulated in VMEM across q-blocks
(grid-revisited output blocks).

Equivalence to the naive path is tested in interpret mode on CPU and
compiled on TPU (mirrors the reference's own encoder-equivalence test
methodology, reference: model/encoder.py:227-342).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1e9


def _allowed(kcode, qrow):
    return (kcode[None, :] == 1) | (
        (qrow[:, None] == 1) & (kcode[None, :] == 2))


def _fwd_kernel(q_ref, k_ref, v_ref, kcode_ref, qrow_ref, o_ref, lse_ref,
                *, sm_scale):
    kcode = kcode_ref[0, 0]                                  # [N]
    qrow = qrow_ref[0, 0]                                    # [bq]
    allowed = _allowed(kcode, qrow)
    q = q_ref[0, 0]                                          # [bq, dh]
    k = k_ref[0, 0]                                          # [N, dh]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale       # [bq, N]
    s = jnp.where(allowed, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)                   # [bq, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l)).astype(lse_ref.dtype)   # [bq, 1]


def _bwd_kernel(q_ref, k_ref, v_ref, kcode_ref, qrow_ref, o_ref, lse_ref,
                do_ref, dq_ref, dk_ref, dv_ref, *, sm_scale):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    kcode = kcode_ref[0, 0]
    qrow = qrow_ref[0, 0]
    allowed = _allowed(kcode, qrow)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    o = o_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]                                      # [bq, 1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(allowed, s, NEG)
    p = jnp.exp(s - lse)                                     # [bq, N]
    dv_ref[0, 0] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [bq, N]
    delta = jnp.sum(do * o, axis=-1, keepdims=True)          # [bq, 1]
    ds = p * (dp - delta)
    dq_ref[0, 0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        * sm_scale).astype(dq_ref.dtype)
    dk_ref[0, 0] += (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        * sm_scale).astype(dk_ref.dtype)


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _block_q(N):
    # cap blocks at 128 rows: one [128, N] f32 score tile stays well
    # inside VMEM even at eval scale (N~2048)
    return min(128, max(8, 1 << (N - 1).bit_length()))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_role_attention(q, k, v, kcode, qrow, interpret=False):
    """Fused ALINE-masked attention.

    Args:
        q/k/v: [B, H, N, dh] float32.
        kcode: [B, N] int32 column codes (0/1/2, see module docstring).
        qrow:  [B, N] int32 row-is-query flags.
    Returns:
        [B, H, N, dh] attention outputs.
    """
    o, _ = _flash_fwd(q, k, v, kcode, qrow, interpret)
    return o


def _prep(q, k, v, kcode, qrow):
    B, H, N, dh = q.shape
    bq = _block_q(N)
    Np = ((N + bq - 1) // bq) * bq
    return (B, H, N, dh, bq, Np,
            _pad_to(q, Np, 2), _pad_to(k, Np, 2), _pad_to(v, Np, 2),
            _pad_to(kcode.astype(jnp.int32), Np, 1)[:, None],   # [B,1,Np]
            _pad_to(qrow.astype(jnp.int32), Np, 1)[:, None])


def _flash_fwd(q, k, v, kcode, qrow, interpret):
    B, H, N, dh, bq, Np, q_p, k_p, v_p, kcode_p, qrow_p = _prep(
        q, k, v, kcode, qrow)
    nq = Np // bq
    sm_scale = 1.0 / math.sqrt(dh)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale),
        grid=(B, H, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Np, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Np, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Np), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, h, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Np, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q_p, k_p, v_p, kcode_p, qrow_p)
    o = o[:, :, :N]
    lse = lse[:, :, :N, 0]
    return o, (q, k, v, kcode, qrow, o, lse)


def _flash_bwd(interpret, res, g):
    q, k, v, kcode, qrow, o, lse = res
    B, H, N, dh, bq, Np, q_p, k_p, v_p, kcode_p, qrow_p = _prep(
        q, k, v, kcode, qrow)
    o_p = _pad_to(o, Np, 2)
    do_p = _pad_to(g, Np, 2)
    # padded rows: lse=0 with all-masked scores gives p=exp(NEG)≈0 → no-op
    lse_p = _pad_to(lse, Np, 2)[..., None]                   # [B,H,Np,1]
    nq = Np // bq
    sm_scale = 1.0 / math.sqrt(dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale),
        grid=(B, H, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Np, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Np, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Np), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Np, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Np, dh), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Np, dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Np, dh), q.dtype),
        ],
        interpret=interpret,
    )(q_p, k_p, v_p, kcode_p, qrow_p, o_p, lse_p, do_p)
    return (dq[:, :, :N], dk[:, :, :N], dv[:, :, :N], None, None)


flash_role_attention.defvjp(_flash_fwd, _flash_bwd)


def roles_to_codes(roles):
    """Convert Roles flags to the kernel's (kcode, qrow) int vectors."""
    kcode = (roles.k_is_ctx.astype(jnp.int32)
             + 2 * (roles.k_is_sel | roles.k_is_time[None, :]).astype(
                 jnp.int32) * (~roles.k_is_ctx).astype(jnp.int32))
    return kcode, roles.q_is_query.astype(jnp.int32)
