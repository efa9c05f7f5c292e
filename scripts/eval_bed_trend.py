#!/usr/bin/env python
"""Bracket-vs-L convergence trend for the sPCE/sNMC bounds (VERDICT r3
item 7): characterize how the sPCE↔sNMC gap closes as the contrastive
sample count L grows, for a trained policy's rollouts.

TPU-native trick: the streaming logsumexp evaluator is snapshotted at
intermediate L values as it folds chunks, so ONE pass at the largest L
yields the whole curve (``compute_eig_from_history(L_checkpoints=...)``)
— a 4-point trend costs the same as its most expensive point. The
reference recomputes from scratch per L (utils/eval.py:42-140).

Usage:
    python scripts/eval_bed_trend.py RUN_DIR [--file-name aline_ces]
        [--L-checkpoints 1000000,3000000,10000000,30000000] [--M 200]
        [--batch-size 100] [--n-query 2000] [--T 15]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from aline_tpu.utils.preflight import wait_for_backend
    wait_for_backend()
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--file-name", default="aline")
    ap.add_argument("--L-checkpoints",
                    default="1000000,3000000,10000000,30000000")
    ap.add_argument("--M", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--n-query", type=int, default=2000)
    ap.add_argument("--T", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from aline_tpu.eval.eig import compute_eig_from_history
    from aline_tpu.eval.traces import get_traces
    from aline_tpu.tasks import build_task
    from aline_tpu.utils.serialization import load_config_and_model

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    task = build_task(cfg.task)
    T = args.T if args.T is not None else \
        cfg.eval.T_final - cfg.task.n_context_init
    Ls = sorted(int(float(s)) for s in args.L_checkpoints.split(","))
    L_max = Ls[-1]
    key = jax.random.key(args.seed)

    per_L = {}
    B = args.batch_size
    n_steps = (args.M + B - 1) // B
    for step in range(n_steps):
        key, k_batch, k_roll, k_eig = jax.random.split(key, 4)
        batch = task.sample_batch(k_batch, B, n_query=args.n_query)
        theta_0, x, y = get_traces(model, params, task, batch, T, k_roll,
                                   cfg.time_token)
        curve = compute_eig_from_history(task, theta_0, x, y, L_max, k_eig,
                                         L_checkpoints=Ls)
        for L_eff, (pce, nmc) in curve.items():
            d = per_L.setdefault(L_eff, ([], []))
            d[0].append(np.asarray(pce))
            d[1].append(np.asarray(nmc))
        print(f"outer step {step + 1}/{n_steps} done", flush=True)

    results = {}
    print(f"{'L':>12} {'sPCE':>18} {'sNMC':>18} {'gap':>8}")
    for L_eff in sorted(per_L):
        pce = np.concatenate(per_L[L_eff][0])[:args.M]
        nmc = np.concatenate(per_L[L_eff][1])[:args.M]
        se_p = pce.std(0) / np.sqrt(pce.shape[0])
        se_n = nmc.std(0) / np.sqrt(nmc.shape[0])
        results[f"L{L_eff}_pce"] = pce
        results[f"L{L_eff}_nmc"] = nmc
        print(f"{L_eff:>12d} {pce.mean():>10.3f} ± {se_p:<5.3f} "
              f"{nmc.mean():>10.3f} ± {se_n:<5.3f} "
              f"{nmc.mean() - pce.mean():>8.3f}", flush=True)

    out_dir = os.path.join(args.run_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"bounds_trend_M{args.M}_T{T}.npz")
    np.savez(out, **results)
    print("saved", out)


if __name__ == "__main__":
    main()
