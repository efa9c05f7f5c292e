#!/usr/bin/env python
"""Benchmark harness: design rollouts/sec/chip on the GP-AL-1D recipe.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is full TRAINING throughput — per wall-clock second, how many
complete T=30 experiment rollouts (sample GP batch → 30-step acquisition
rollout → REINFORCE+NLL loss → backward → AdamW step) finish on one chip.
``vs_baseline`` compares against the PyTorch reference workload measured on
this host (benchmarks/baseline_torch.json, produced by
scripts/torch_baseline.py — the reference repo publishes no numbers, see
BASELINE.md).
"""
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from aline_tpu.utils.preflight import wait_for_backend  # noqa: E402


def main():
    wait_for_backend()
    import jax

    from aline_tpu.config import parse_overrides
    from aline_tpu.train.loop import Trainer

    B, T = 200, 30
    cfg = parse_overrides([
        "task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
        "task.n_query_init=200", "task.lengthscale_lower=0.1",
        "task.lengthscale_upper=2.0", "task.design_scale=5", "gamma=1",
        f"min_T={T}", f"T={T}", f"batch_size={B}",
        "burning_epoch=0", "max_epoch=10", "checkpoint=0", "verbose=1000000",
        "mesh_data=1",  # single chip
        # bf16 is the production configuration: a 60k-epoch bf16 flagship
        # run tracks the f32 likelihood trajectory within noise
        # (benchmarks/artifacts/bf16_convergence.npz, scripts/bf16_evidence.py)
        "dtype=bfloat16",
    ])
    cfg.output_dir = "/tmp/aline_bench"
    log(f"bench devices: {jax.devices()}")

    trainer = Trainer(cfg)

    # warmup: trigger compilation of sample + step. The split mask gives
    # TWO statically specialized step variants (static_mask_keys); keep
    # warming until the step cache stops growing so no compile can land
    # inside a measured window.
    n_warm, n_meas, n_windows = 3, 10, 3
    e, last_growth, cache_sz = 0, 0, -1
    while e < n_warm or (e - last_growth < 8 and e < 32):
        m = trainer.train_epoch(e)
        if len(trainer._step_cache) != cache_sz:
            cache_sz, last_growth = len(trainer._step_cache), e
        e += 1
    n_warm = e
    _ = float(m["loss"])  # hard sync (block_until_ready can be unreliable
    #                       over remote-device transports)

    # several independent windows -> median throughput + spread
    rates = []
    epoch = n_warm
    for w in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_meas):
            m = trainer.train_epoch(epoch)
            epoch += 1
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        rates.append(B * n_meas / dt)
        log(f"window {w}: {dt / n_meas * 1e3:.1f} ms/epoch → "
            f"{rates[-1]:.1f} rollouts/s")

    rates.sort()
    rollouts_per_sec = rates[len(rates) // 2]
    spread = (rates[-1] - rates[0]) / rollouts_per_sec
    log(f"median {rollouts_per_sec:.1f} rollouts/s "
        f"(min {rates[0]:.1f}, max {rates[-1]:.1f}, spread {spread:.1%})")

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_torch.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = rollouts_per_sec / float(base["value"])

    print(json.dumps({
        "metric": "design rollouts/sec/chip (GP-AL-1D train, T=30, B=200)",
        "value": round(rollouts_per_sec, 3),
        "unit": "rollouts/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
