#!/usr/bin/env python
"""Headless BED evaluation (replaces notebooks/eval_bed.ipynb).

Computes final stepwise sPCE/sNMC bounds for a trained run and compares
against random-design and DAD-style baselines on the same budget.

Usage:
    python scripts/eval_bed.py RUN_DIR [--L 1000000] [--M 2000]
        [--batch-size 200] [--n-query 2000] [--T 35]
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
    ap.add_argument("--L", type=int, default=1_000_000)
    ap.add_argument("--M", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=200)
    ap.add_argument("--n-query", type=int, default=2000)
    ap.add_argument("--T", type=int, default=None)
    ap.add_argument("--L-chunk", type=int, default=32768)
    ap.add_argument("--with-random-baseline", action="store_true")
    ap.add_argument("--skip-policy", action="store_true",
                    help="only compute the random-design baseline (uses the "
                         "run dir for task config only)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from aline_tpu.eval.eig import compute_eig_from_history, eval_boed
    from aline_tpu.tasks import build_task
    from aline_tpu.utils.serialization import load_config_and_model

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    task = build_task(cfg.task)
    T = args.T if args.T is not None else \
        cfg.eval.T_final - cfg.task.n_context_init
    key = jax.random.key(args.seed)

    results = {}
    if not args.skip_policy:
        bounds = eval_boed(model, params, task, T, args.L, args.M,
                           args.batch_size, key, cfg.time_token,
                           stepwise=True, L_chunk=args.L_chunk,
                           n_query=args.n_query)
        print("ALINE policy:")
        print("  sPCE per step:", np.array2string(bounds["pce_mean"],
                                                  precision=3))
        print("  sNMC per step:", np.array2string(bounds["nmc_mean"],
                                                  precision=3))
        results = {f"aline_{k}": v for k, v in bounds.items()}

    if args.with_random_baseline:
        # random designs at the SAME protocol scale as the policy: M outer
        # rollouts in batch_size chunks, mean ± SE across all M (fixes the
        # round-2 M-mismatch where the baseline was a single batch)
        pces, nmcs = [], []
        B = args.batch_size
        for _ in range((args.M + B - 1) // B):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            theta = task.sample_theta(k1, (B,))
            x = task.sample_data(k2, B, T + task.n_context_init)
            y = task.simulate(k3, task.unnormalise_design(x),
                              theta[:, None])
            pce, nmc = compute_eig_from_history(
                task, theta, task.unnormalise_design(x), y, args.L, k4,
                L_chunk=args.L_chunk, stepwise=True)
            pces.append(np.asarray(pce))
            nmcs.append(np.asarray(nmc))
        pce = np.concatenate(pces, axis=0)[:args.M]
        nmc = np.concatenate(nmcs, axis=0)[:args.M]
        results["random_pce_mean"] = pce.mean(0)
        results["random_pce_err"] = pce.std(0) / np.sqrt(pce.shape[0])
        results["random_nmc_mean"] = nmc.mean(0)
        results["random_nmc_err"] = nmc.std(0) / np.sqrt(nmc.shape[0])
        print(f"random designs (M={pce.shape[0]}):")
        print("  sPCE per step:",
              np.array2string(results["random_pce_mean"], precision=3))

    out_dir = os.path.join(args.run_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    stem = "random_bounds" if args.skip_policy else "bed_bounds"
    out = os.path.join(out_dir,
                       f"{stem}_N{args.n_query}_T{T}_L{args.L}.npz")
    np.savez(out, **results)
    print(f"saved bounds to {out}")


if __name__ == "__main__":
    main()
