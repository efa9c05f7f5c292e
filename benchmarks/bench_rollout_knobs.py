#!/usr/bin/env python
"""A/B the rollout perf knobs (remat policy x scan unroll) on the bench
config (GP-AL-1D train, B=200, T=30, bf16) — same methodology as bench.py.

Run: python benchmarks/bench_rollout_knobs.py [combo ...]
where combo is remat:unroll, e.g. full:1 dots:1 none:1 full:2 dots:5
(default sweeps a standard grid). Writes
benchmarks/artifacts/bench_rollout_knobs.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = ["full:1", "dots:1", "none:1", "full:2", "dots:2", "full:5", "dots:5"]
B, T = 200, 30
N_WARM, N_MEAS, N_WINDOWS = 3, 10, 3


def bench_one(combo):
    from aline_tpu.config import parse_overrides
    from aline_tpu.train.loop import Trainer

    remat, unroll = combo.split(":")
    cfg = parse_overrides([
        "task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
        "task.n_query_init=200", "task.lengthscale_lower=0.1",
        "task.lengthscale_upper=2.0", "task.design_scale=5", "gamma=1",
        f"min_T={T}", f"T={T}", f"batch_size={B}",
        "burning_epoch=0", "max_epoch=10", "checkpoint=0",
        "verbose=1000000", "mesh_data=1", "dtype=bfloat16",
        f"rollout_remat={'false' if remat == 'none' else 'true'}",
        f"remat_policy={remat if remat != 'none' else 'full'}",
        f"rollout_unroll={unroll}",
    ])
    cfg.output_dir = f"/tmp/aline_knobs_{remat}_{unroll}"
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
    for _w in range(N_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(N_MEAS):
            m = trainer.train_epoch(epoch)
            epoch += 1
        _ = float(m["loss"])
        rates.append(B * N_MEAS / (time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    print(f"{combo:>8}: {1e3 * B / med:7.1f} ms/epoch  "
          f"{med:7.1f} rollouts/s  (spread "
          f"{(rates[-1] - rates[0]) / med:.1%})", flush=True)
    return {"rollouts_per_sec": round(med, 2),
            "ms_per_epoch": round(1e3 * B / med, 2)}


def main():
    import jax
    combos = sys.argv[1:] or GRID
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for combo in combos:
        try:
            results[combo] = bench_one(combo)
        except Exception as e:  # OOM for none:1 is a legitimate outcome
            print(f"{combo:>8}: FAILED ({type(e).__name__}: {e})",
                  flush=True)
            results[combo] = {"error": str(e)[:200]}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "bench_rollout_knobs.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("saved", out)


if __name__ == "__main__":
    main()
