#!/usr/bin/env python
"""Wide-head attention benchmark: where (if anywhere) does the Pallas
flash kernel win?

Round-3 VERDICT item 2: the flash kernel loses 2-6x to compact-key at the
model's own operating points (d_head=8 -> 128-lane padding wastes 94% of
the MXU), and the "would win at d_head >= 64" claim was unmeasured.  This
script measures it: a grid over d_head in {64, 128}, sequence lengths up
to 2048, and sparse vs half-dense context masks, f32 + bf16, fwd and
fwd+bwd, for all three implementations (XLA dense-bias, compact-key
gather, Pallas flash).  It also reports achieved effective TFLOP/s
(dense-equivalent attention FLOPs / time) and % of the chip's bf16 peak,
giving the framework its first MXU-bound datapoint (the reference-scale
model is latency-bound at 0.11% MFU, benchmarks/roofline.py).

Run on the TPU:  python benchmarks/bench_attention_wide.py
Writes benchmarks/artifacts/bench_attention_wide.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aline_tpu.ops.attention import compact_attention, dense_bias_attention
from aline_tpu.ops.flash_attention import (flash_role_attention,
                                           roles_to_codes)
from benchmarks.bench_attention import (compact_plan, dense_bias,
                                        make_problem, timeit)

# v5e bf16 peak (MXU): 394 TFLOP/s; f32 runs at ~1/2 via passthrough
PEAK_BF16 = 394e12


def attention_flops(B, H, N, dh):
    """Dense-equivalent fwd FLOPs: QK^T and AV, 2*N*N*dh MACs each."""
    return 2 * (2 * B * H * N * N * dh)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = []
    # (tag, B, N, n_ctx, H, dh): wide-model operating points.  n_ctx is
    # the context-row count (compact's key budget); n_sel stays small.
    grid = [
        ("wide64-sparse", 16, 1024, 128, 8, 64),
        ("wide64-half", 16, 1024, 512, 8, 64),
        ("wide64-long", 4, 2048, 256, 8, 64),
        ("wide64-long-half", 4, 2048, 1024, 8, 64),
        ("wide128-sparse", 8, 1024, 128, 8, 128),
        ("wide128-half", 8, 1024, 512, 8, 128),
    ]
    for tag, B, N, n_ctx, H, dh in grid:
        for dtype in (jnp.float32, jnp.bfloat16):
            dname = np.dtype(dtype).name
            q, k, v, roles = make_problem(jax.random.key(0), B, N, n_ctx,
                                          3, H=H, dh=dh, dtype=dtype)
            bias = dense_bias(roles)
            plan = compact_plan(roles, n_ctx + 1)
            kcode, qrow = roles_to_codes(roles)
            paths = {
                "dense": jax.jit(lambda q, k, v: dense_bias_attention(
                    q, k, v, bias)),
                "compact": jax.jit(lambda q, k, v: compact_attention(
                    q, k, v, roles, plan)),
                "flash": jax.jit(lambda q, k, v: flash_role_attention(
                    q, k, v, kcode, qrow)),
            }
            flops = attention_flops(B, H, N, dh)
            for name, fn in paths.items():
                row = dict(tag=tag, B=B, N=N, n_ctx=n_ctx, H=H, dh=dh,
                           dtype=dname, impl=name)
                try:
                    ms_f = timeit(fn, q, k, v)
                except Exception as e:               # noqa: BLE001
                    print(f"{tag:18s} {dname:8s} {name:8s} fwd FAILED: "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)
                    continue
                gfn = jax.jit(jax.grad(
                    lambda q, k, v, f=fn: jnp.sum(
                        f(q, k, v).astype(jnp.float32) ** 2),
                    argnums=(0, 1, 2)))
                try:
                    ms_g = timeit(gfn, q, k, v)
                except Exception as e:               # noqa: BLE001
                    ms_g = float("nan")
                    print(f"{tag:18s} {dname:8s} {name:8s} bwd FAILED: "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)
                tflops = flops / (ms_f * 1e-3) / 1e12
                row.update(fwd_ms=ms_f, fwdbwd_ms=ms_g,
                           eff_tflops=tflops,
                           pct_peak_bf16=100 * tflops * 1e12 / PEAK_BF16)
                results.append(row)
                print(f"{tag:18s} {dname:8s} {name:8s} "
                      f"fwd {ms_f:8.3f} ms  fwd+bwd {ms_g:8.3f} ms  "
                      f"eff {tflops:7.2f} TF/s "
                      f"({row['pct_peak_bf16']:5.1f}% bf16 peak)",
                      flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "bench_attention_wide.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("saved", out)


if __name__ == "__main__":
    main()
