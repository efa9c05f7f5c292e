#!/usr/bin/env python
"""Attention-core benchmark: dense-bias vs compact-key vs Pallas flash.

Measures the ALINE-masked attention at the model's two operating points
(train: B=200, N=403; eval: B=100, N=2003; H=4, dh=8), forward-only and
forward+backward, f32 and bf16.  Grounds the `attention_impl=auto`
decision recorded in docs/PERFORMANCE.md (VERDICT round 1 item 5).

Run on the TPU:  python benchmarks/bench_attention.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from aline_tpu.ops.attention import (CompactKeys, compact_attention,
                                     context_indices, dense_bias_attention)
from aline_tpu.ops.flash_attention import flash_role_attention
from aline_tpu.ops.roles import NEG_INF, Roles


def make_problem(key, B, N, n_ctx, n_sel, H=4, dh=8, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, H, N, dh), dtype)
    k = jax.random.normal(ks[1], (B, H, N, dh), dtype)
    v = jax.random.normal(ks[2], (B, H, N, dh), dtype)
    # scattered context tokens (static-pool layout: flags flip in place)
    idx = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
        jax.random.split(ks[3], B))
    ctx = jnp.zeros((B, N), bool).at[
        jnp.arange(B)[:, None], idx[:, :n_ctx]].set(True)
    sel = jnp.zeros((B, N), bool).at[
        jnp.arange(B)[:, None], idx[:, n_ctx:n_ctx + n_sel]].set(True)
    sel = sel & ~ctx
    qrow = ~ctx & ~sel
    roles = Roles(k_is_ctx=ctx, k_is_sel=sel,
                  k_is_time=jnp.zeros((N,), bool), q_is_query=qrow)
    return q, k, v, roles


def dense_bias(roles):
    B, N = roles.k_is_ctx.shape
    allowed = roles.k_is_ctx[:, None, :] | (
        roles.q_is_query[:, :, None] & roles.k_is_sel[:, None, :])
    return jnp.where(allowed, 0.0, NEG_INF)[:, None]


def compact_plan(roles, capacity):
    idx, valid = context_indices(roles.k_is_ctx, capacity)
    return CompactKeys(ctx_idx=idx, ctx_valid=valid,
                       n_points=roles.k_is_ctx.shape[1], time_offset=0)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x[(0,) * x.ndim]), out)  # hard sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[(0,) * x.ndim]), out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    print(f"devices: {jax.devices()}")
    results = []
    for scale, B, N, n_ctx, n_sel in (("train", 200, 403, 31, 3),
                                      ("eval", 100, 2003, 31, 3)):
        for dtype in (jnp.float32, jnp.bfloat16):
            dname = np.dtype(dtype).name
            q, k, v, roles = make_problem(
                jax.random.key(0), B, N, n_ctx, n_sel, dtype=dtype)
            bias = dense_bias(roles)
            plan = compact_plan(roles, n_ctx + 1)
            from aline_tpu.ops.flash_attention import roles_to_codes
            kcode, qrow = roles_to_codes(roles)

            paths = {
                "dense": jax.jit(lambda q, k, v: dense_bias_attention(
                    q, k, v, bias)),
                "compact": jax.jit(lambda q, k, v: compact_attention(
                    q, k, v, roles, plan)),
                "flash": jax.jit(lambda q, k, v: flash_role_attention(
                    q, k, v, kcode, qrow)),
            }
            for name, fn in paths.items():
                try:
                    ms_f = timeit(fn, q, k, v)
                except Exception as e:                 # noqa: BLE001
                    print(f"{scale:5s} {dname:8s} {name:8s} fwd FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                gfn = jax.jit(jax.grad(
                    lambda q, k, v, f=fn: jnp.sum(
                        f(q, k, v).astype(jnp.float32) ** 2),
                    argnums=(0, 1, 2)))
                try:
                    ms_g = timeit(gfn, q, k, v)
                except Exception as e:                 # noqa: BLE001
                    ms_g = float("nan")
                    print(f"{scale:5s} {dname:8s} {name:8s} bwd FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}")
                print(f"{scale:5s} {dname:8s} {name:8s} "
                      f"fwd {ms_f:7.2f} ms   fwd+bwd {ms_g:7.2f} ms",
                      flush=True)
                results.append((scale, dname, name, ms_f, ms_g))
    return results


if __name__ == "__main__":
    main()
