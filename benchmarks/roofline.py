#!/usr/bin/env python
"""Speed-of-light (roofline) analysis of the headline training epoch.

Uses XLA's own post-optimization cost model (`compiled.cost_analysis()`)
to count the FLOPs and estimated memory traffic of one full bench-config
training epoch (batch simulate + T=30 rollout + REINFORCE/NLL backward +
AdamW), then combines them with the *measured* ms/epoch from
benchmarks/artifacts/bench_tasks.json to report achieved TFLOP/s and
effective GB/s as fractions of the TPU v5e peaks.

Run on CPU (JAX_PLATFORMS=cpu) — the FLOP count is a property of the
compiled computation, not of the executing chip; the bytes-accessed
figure is XLA's per-op estimate (an upper bound on true HBM traffic,
since it ignores on-chip reuse inside fusions) and is labeled as such.

Writes benchmarks/artifacts/roofline.json and prints the table.

Reference for the workload being measured: the reference implementation's
per-epoch loop (train_aline.py:53-152) at the GP-AL-1D recipe
(README.md:35).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aline_tpu.config import parse_overrides  # noqa: E402
from aline_tpu.train.loop import Trainer  # noqa: E402
from aline_tpu.tasks.base import init_ctx_idx  # noqa: E402

# TPU v5e (one chip) public peaks: 197 bf16 TFLOP/s, 819 GB/s HBM BW.
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BW = 819e9


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    B, T = 200, 30
    cfg = parse_overrides([
        "task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
        "task.n_query_init=200", "task.lengthscale_lower=0.1",
        "task.lengthscale_upper=2.0", "task.design_scale=5", "gamma=1",
        f"min_T={T}", f"T={T}", f"batch_size={B}", "burning_epoch=0",
        "max_epoch=10", "checkpoint=0", "verbose=1000000", "mesh_data=1",
        "dtype=bfloat16",
    ])
    cfg.output_dir = "/tmp/aline_roofline"
    trainer = Trainer(cfg)
    trainer._ensure_phase("main")

    # --- sampler cost ---
    key = trainer.key
    nq = cfg.task.n_query_init

    def _sample(k):
        return trainer.task.sample_batch(jax.random.fold_in(k, 0x5A17),
                                         B, nq)

    sample_lowered = jax.jit(_sample).lower(key)
    sample_flops, sample_bytes = cost(sample_lowered.compile())
    batch = jax.jit(_sample)(key)

    # --- step cost (same step fn the trainer jits) ---
    mask, w_q, w_p = trainer._epoch_mask_and_weights()
    batch = batch.replace(target_mask=jnp.asarray(mask))
    batch = init_ctx_idx(
        batch, min(trainer.task.n_context_init + T, batch.n_points))
    # lower the same mask-specialized step variant the trainer actually
    # runs (bench_tasks.json times the specialized steps; lowering the
    # generic one would count slightly different work than was timed)
    step_fn = trainer._get_step(T, trainer._static_sel(mask))
    lowered = step_fn.lower(trainer.params, trainer.opt_state, key, batch,
                            jnp.asarray(w_q), jnp.asarray(w_p),
                            jnp.asarray(1.0, jnp.float32))
    step_flops, step_bytes = cost(lowered.compile())

    flops = sample_flops + step_flops
    bytes_ = sample_bytes + step_bytes

    # measured epoch time on the real chip (bench_tasks.json, headline row)
    bt_path = os.path.join(REPO, "benchmarks/artifacts/bench_tasks.json")
    ms_epoch = 252.9  # docs/PERFORMANCE.md round-3 table fallback
    if os.path.exists(bt_path):
        with open(bt_path) as f:
            row = json.load(f).get("gp_al_1d")
        if row:
            ms_epoch = float(row["ms_per_epoch"])

    t = ms_epoch / 1e3
    achieved_flops = flops / t
    achieved_bw = bytes_ / t
    intensity = flops / bytes_ if bytes_ else float("nan")
    ridge = V5E_PEAK_FLOPS / V5E_PEAK_BW

    print(f"workload: GP-AL-1D training epoch, B={B}, T={T}, bf16")
    print(f"  sampler : {sample_flops / 1e9:8.2f} GFLOP  "
          f"{sample_bytes / 1e6:8.1f} MB accessed (XLA estimate)")
    print(f"  step    : {step_flops / 1e9:8.2f} GFLOP  "
          f"{step_bytes / 1e6:8.1f} MB accessed")
    print(f"  total   : {flops / 1e9:8.2f} GFLOP  {bytes_ / 1e6:8.1f} MB")
    print(f"  arithmetic intensity: {intensity:.1f} FLOP/B "
          f"(v5e ridge point {ridge:.0f} FLOP/B)")
    print(f"  measured: {ms_epoch:.1f} ms/epoch on one v5e chip")
    print(f"  achieved: {achieved_flops / 1e12:.3f} TFLOP/s "
          f"= {100 * achieved_flops / V5E_PEAK_FLOPS:.2f}% of bf16 peak")
    print(f"  implied traffic: {achieved_bw / 1e9:.1f} GB/s "
          f"= {100 * achieved_bw / V5E_PEAK_BW:.1f}% of HBM peak "
          f"(upper bound on true traffic)")
    bound = "bandwidth/latency" if intensity < ridge else "compute"
    print(f"  roofline regime: {bound}-bound")

    out = dict(B=B, T=T, dtype="bfloat16",
               sample_flops=sample_flops, sample_bytes=sample_bytes,
               step_flops=step_flops, step_bytes=step_bytes,
               ms_per_epoch_measured=ms_epoch,
               achieved_tflops=achieved_flops / 1e12,
               pct_of_bf16_peak=100 * achieved_flops / V5E_PEAK_FLOPS,
               implied_gbps=achieved_bw / 1e9,
               pct_of_hbm_peak=100 * achieved_bw / V5E_PEAK_BW,
               arithmetic_intensity=intensity, ridge_point=ridge,
               regime=bound)
    dest = os.path.join(REPO, "benchmarks/artifacts/roofline.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"saved {dest}")


if __name__ == "__main__":
    main()
