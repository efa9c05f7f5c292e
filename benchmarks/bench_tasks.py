#!/usr/bin/env python
"""Per-task training-throughput benchmark table (round-3 VERDICT #7).

Measures design rollouts/sec/chip for every canonical config with the
same 3-window methodology as the headline ``bench.py`` (which stays
GP-AL-1D): warm up past compilation, then time three independent
windows of full training epochs (simulate batch → T-step rollout →
REINFORCE+NLL loss → backward → AdamW step) and report the median.

Run on the bench chip:   python benchmarks/bench_tasks.py
Writes benchmarks/artifacts/bench_tasks.json and prints one table.

Recipe parameters mirror the reference README training commands
(reference: README.md:30-56) as used by the round-2/3 training runs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "gp_al_1d": ["task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
                 "task.n_query_init=200", "task.lengthscale_lower=0.1",
                 "task.lengthscale_upper=2.0", "task.design_scale=5",
                 "gamma=1", "min_T=30", "T=30"],
    "gp_al_2d": ["task=al_mix", "task.dim_x=2", "task.n_target_theta=3",
                 "task.n_query_init=200", "task.design_scale=5",
                 "gamma=1", "min_T=50", "T=50"],
    "location_finding": ["task=location_finding", "task.theta_dist=uniform",
                         "task.n_target_theta=2", "task.K=1",
                         "task.n_query_init=200", "gamma=1",
                         "min_T=30", "T=30"],
    "ces": ["task=ces", "task.n_query_init=200", "gamma=1",
            "min_T=10", "T=10"],
    "psychometric": ["task=psychometric", "task.mask_type=[predefined]",
                     "gamma=0.99", "min_T=30", "T=30"],
    "hpo": ["task=hpo", "gamma=1", "min_T=30", "T=30"],
}

B = 200
N_WARM, N_MEAS, N_WINDOWS = 3, 10, 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_one(name, overrides):
    from aline_tpu.config import parse_overrides
    from aline_tpu.train.loop import Trainer

    cfg = parse_overrides(overrides + [
        f"batch_size={B}", "burning_epoch=0", "max_epoch=10",
        "checkpoint=0", "verbose=1000000", "mesh_data=1", "dtype=bfloat16",
    ])
    cfg.output_dir = f"/tmp/aline_bench_{name}"
    T = cfg.T
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
    for w in range(N_WINDOWS):
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
    log(f"{name}: T={T} median {med:.1f} rollouts/s "
        f"({1e3 * B / med:.1f} ms/epoch, spread {spread:.1%})")
    return {"T": T, "B": B, "rollouts_per_sec": round(med, 2),
            "ms_per_epoch": round(1e3 * B / med, 2),
            "spread": round(spread, 4)}


def main():
    from bench import wait_for_backend
    wait_for_backend()
    import jax
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else list(CONFIGS)
    log(f"bench devices: {jax.devices()}")
    results = {}
    for name in only:
        try:
            results[name] = bench_one(name, CONFIGS[name])
        except Exception as e:  # keep the rest of the table on one failure
            log(f"{name}: FAILED ({type(e).__name__}: {e})")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "bench_tasks.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)

    print(f"{'config':>18} {'T':>3} {'B':>4} {'rollouts/s':>11} "
          f"{'ms/epoch':>9} {'spread':>7}")
    for name, r in existing.items():
        print(f"{name:>18} {r['T']:>3} {r['B']:>4} "
              f"{r['rollouts_per_sec']:>11.1f} {r['ms_per_epoch']:>9.1f} "
              f"{r['spread']:>6.1%}")
    log(f"saved {out}")


if __name__ == "__main__":
    main()
