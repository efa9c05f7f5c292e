"""Pallas fused GMM-posterior-head kernel.

The GMM target head runs ``num_components`` independent 2-layer MLPs over
every token (reference: model/head.py:115-266).  The XLA einsum
formulation materializes the per-component hidden activations
``[B, T, C, F]`` in HBM — the single largest intermediate of both the
training step (≈310 MB per rollout step at B=200, T=303, C=10, F=128) and
evaluation (≈10 GB of traffic at n_query=2000).

This kernel keeps the hidden layer entirely in VMEM: for each (batch row,
token tile) the C component MLPs run back to back and only the final
``[tile, 3·C]`` parameter block is written out.  HBM traffic drops to
(read z + read weights + write out).

Backward is a second kernel that recomputes the hidden activations per
tile and accumulates the weight gradients in grid-revisited VMEM blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fwd_kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, C):
    z = z_ref[0]                                             # [bt, D]
    outs = []
    for c in range(C):
        h = jnp.maximum(jax.lax.dot_general(
            z, w1_ref[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[c], 0.0)
        o = jax.lax.dot_general(
            h, w2_ref[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[c]  # [bt, 3]
        outs.append(o)
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


def _bwd_kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dz_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, C):
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((b == 0) & (i == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    z = z_ref[0]                                             # [bt, D]
    g = g_ref[0]                                             # [bt, 3C]
    dz = jnp.zeros_like(z, dtype=jnp.float32)
    for c in range(C):
        gc = g[:, 3 * c: 3 * (c + 1)]                        # [bt, 3]
        pre = jax.lax.dot_general(
            z, w1_ref[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[c]
        h = jnp.maximum(pre, 0.0)                            # [bt, F]
        # dW2 += h^T gc ; db2 += sum gc
        dw2_ref[c] += jax.lax.dot_general(
            h, gc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dw2_ref.dtype)
        db2_ref[c] += jnp.sum(gc, axis=0).astype(db2_ref.dtype)
        # dh = gc W2^T masked by relu'
        dh = jax.lax.dot_general(
            gc, w2_ref[c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jnp.where(pre > 0.0, dh, 0.0)                   # [bt, F]
        dw1_ref[c] += jax.lax.dot_general(
            z, dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dw1_ref.dtype)
        db1_ref[c] += jnp.sum(dh, axis=0).astype(db1_ref.dtype)
        dz = dz + jax.lax.dot_general(
            dh, w1_ref[c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    dz_ref[0] = dz.astype(dz_ref.dtype)


def _block_t(T):
    return min(512, max(8, 1 << (T - 1).bit_length()))


def _pad_rows(x, size):
    pad = size - x.shape[1]
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_gmm_head(z, w1, b1, w2, b2, interpret=False):
    """Fused per-component MLP head.

    Args:
        z:  [B, T, D] tokens.
        w1: [C, D, F]; b1: [C, F]; w2: [C, F, 3]; b2: [C, 3].
    Returns:
        [B, T, C, 3] raw (mean, std, weight) per component, float32.
    """
    out, _ = _fused_fwd(z, w1, b1, w2, b2, interpret)
    return out


def _call_fwd(z, w1, b1, w2, b2, interpret):
    B, T, D = z.shape
    C, _, F = w1.shape
    bt = _block_t(T)
    Tp = ((T + bt - 1) // bt) * bt
    z_p = _pad_rows(z, Tp)
    nt = Tp // bt
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((C, D, F), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((C, F), lambda b, i: (0, 0)),
            pl.BlockSpec((C, F, 3), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((C, 3), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, 3 * C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, 3 * C), jnp.float32),
        interpret=interpret,
    )(z_p, w1, b1, w2, b2)
    out = out[:, :T].reshape(B, T, C, 3, order="C")
    # layout [.., c*3 + o] → [B, T, C, 3]
    return out


def _fused_fwd(z, w1, b1, w2, b2, interpret):
    out = _call_fwd(z, w1, b1, w2, b2, interpret)
    return out, (z, w1, b1, w2, b2)


def _fused_bwd(interpret, res, g):
    z, w1, b1, w2, b2 = res
    B, T, D = z.shape
    C, _, F = w1.shape
    bt = _block_t(T)
    Tp = ((T + bt - 1) // bt) * bt
    z_p = _pad_rows(z, Tp)
    g_flat = g.reshape(B, T, 3 * C)
    g_p = _pad_rows(g_flat, Tp)
    nt = Tp // bt
    dz, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((C, D, F), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((C, F), lambda b, i: (0, 0)),
            pl.BlockSpec((C, F, 3), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((C, 3), lambda b, i: (0, 0)),
            pl.BlockSpec((1, bt, 3 * C), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((C, D, F), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((C, F), lambda b, i: (0, 0)),
            pl.BlockSpec((C, F, 3), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((C, 3), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, D), z.dtype),
            jax.ShapeDtypeStruct((C, D, F), jnp.float32),
            jax.ShapeDtypeStruct((C, F), jnp.float32),
            jax.ShapeDtypeStruct((C, F, 3), jnp.float32),
            jax.ShapeDtypeStruct((C, 3), jnp.float32),
        ],
        interpret=interpret,
    )(z_p, w1, b1, w2, b2, g_p)
    return (dz[:, :T], dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_gmm_head.defvjp(_fused_fwd, _fused_bwd)
