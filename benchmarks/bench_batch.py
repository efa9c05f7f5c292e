#!/usr/bin/env python
"""Batch-scaling throughput study on the headline config (roofline follow-up).

The roofline analysis (benchmarks/roofline.py, docs/PERFORMANCE.md) shows
the bench workload at the reference model scale is per-op-latency bound,
predicting that rollouts/s/chip should grow with batch until the tiny ops
fatten. This measures it: training throughput of the GP-AL-1D recipe
(T=30, bf16) at B ∈ {200, 400, 800, 1600} with the same windowed
methodology as bench.py.

NOTE on semantics: B=200 is the reference training recipe
(reference: README.md:35); the headline metric stays B=200. Larger B
changes the REINFORCE batch-normalization population, so these rows are
hardware-capability numbers (rollouts/s a chip can sustain), not claims
of recipe-equivalent convergence.

Run on a quiet bench chip:  python benchmarks/bench_batch.py
Writes benchmarks/artifacts/bench_batch.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = [200, 400, 800, 1600]
N_WARM, N_MEAS, N_WINDOWS = 3, 10, 2
T = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_one(B):
    from aline_tpu.config import parse_overrides
    from aline_tpu.train.loop import Trainer

    cfg = parse_overrides([
        "task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
        "task.n_query_init=200", "task.lengthscale_lower=0.1",
        "task.lengthscale_upper=2.0", "task.design_scale=5", "gamma=1",
        f"min_T={T}", f"T={T}", f"batch_size={B}", "burning_epoch=0",
        "max_epoch=10", "checkpoint=0", "verbose=1000000", "mesh_data=1",
        "dtype=bfloat16",
    ])
    cfg.output_dir = f"/tmp/aline_bench_b{B}"
    trainer = Trainer(cfg)

    # warm until the step cache stops growing: split/predefined masks
    # compile one statically specialized step per variant (see
    # Trainer._static_sel) and none may land in a measured window
    e, last_growth, cache_n = 0, 0, -1
    while e < N_WARM or (e < 40 and e - last_growth < 8):
        m = trainer.train_epoch(e)
        e += 1
        if len(trainer._step_cache) != cache_n:
            cache_n, last_growth = len(trainer._step_cache), e
    n_warm = e
    _ = float(m["loss"])  # hard sync

    rates = []
    epoch = n_warm
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(N_MEAS):
            m = trainer.train_epoch(epoch)
            epoch += 1
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        rates.append(B * N_MEAS / dt)
    rates.sort()
    med = rates[len(rates) // 2]
    spread = (rates[-1] - rates[0]) / med
    log(f"B={B}: median {med:.1f} rollouts/s "
        f"({1e3 * B / med:.1f} ms/epoch, spread {spread:.1%})")
    return {"B": B, "T": T, "rollouts_per_sec": round(med, 2),
            "ms_per_epoch": round(1e3 * B / med, 2),
            "spread": round(spread, 4)}


def main():
    from bench import wait_for_backend
    wait_for_backend()
    import jax
    log(f"bench devices: {jax.devices()}")
    rows = []
    for B in BATCHES:
        try:
            rows.append(bench_one(B))
        except Exception as e:
            log(f"B={B}: FAILED ({type(e).__name__}: {e})")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "bench_batch.json")
    with open(out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(f"{'B':>5} {'rollouts/s':>11} {'ms/epoch':>9} {'vs B=200':>9}")
    base = rows[0]["rollouts_per_sec"] if rows else 1.0
    for r in rows:
        print(f"{r['B']:>5} {r['rollouts_per_sec']:>11.1f} "
              f"{r['ms_per_epoch']:>9.1f} "
              f"{r['rollouts_per_sec'] / base:>8.2f}x")
    log(f"saved {out}")


if __name__ == "__main__":
    main()
