#!/usr/bin/env python
"""Headless psychometric evaluation (replaces
notebooks/eval_psychometric.ipynb).

Evaluates a trained psychometric-task model under each predefined target
mask ({threshold+slope}, {guess+lapse}, all) and reports per-parameter
RMSE and targeted log-likelihood curves over the acquisition steps.

Usage:
    python scripts/eval_psychometric.py RUN_DIR [--batch-size 100] [--T 30]
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
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--T", type=int, default=30)
    ap.add_argument("--n-query", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", default=None,
                    help="comma-separated eval seeds for across-seed error "
                         "bars (overrides --seed)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aline_tpu.eval.al_curves import al_rollout_curves
    from aline_tpu.ops.target_mask import target_weight_vectors
    from aline_tpu.tasks import build_task
    from aline_tpu.utils.serialization import load_config_and_model

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    task = build_task(cfg.task)
    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [args.seed])

    param_names = ["alpha", "beta", "gamma", "lambda"]
    masks = {
        "threshold_slope": np.array([True, True, False, False]),
        "guess_lapse": np.array([False, False, True, True]),
        "all": np.ones(4, bool),
    }
    results = {}
    finals = {}
    for seed in seeds:
        key = jax.random.key(seed)
        k_batch, k_roll = jax.random.split(key)
        pre = "" if seed == seeds[0] else f"seed{seed}_"
        for mask_name, mask in masks.items():
            batch = task.sample_batch(k_batch, args.batch_size,
                                      n_query=args.n_query)
            batch = batch.replace(target_mask=jnp.asarray(mask))
            w_q, _ = target_weight_vectors(mask, cfg.task.embedding_type,
                                           "predefined", 0, 4)
            out = al_rollout_curves(model, params, batch, args.T, k_roll,
                                    target_weights=jnp.asarray(w_q),
                                    time_token=cfg.time_token)
            lp = np.asarray(out["log_prob"])
            rm = np.asarray(out["rmse"])
            results[f"{pre}{mask_name}_log_prob"] = lp
            results[f"{pre}{mask_name}_rmse"] = rm
            finals.setdefault(mask_name, []).append(
                (lp[:, -1].mean(), rm[:, -1].mean()))
            sel = [n for n, m in zip(param_names, mask) if m]
            print(f"[seed {seed}] mask {mask_name} (targets: {sel}): "
                  f"final LL {lp[:, -1].mean():.4f} "
                  f"final RMSE {rm[:, -1].mean():.4f}")
    if len(seeds) > 1:
        print(f"== across {len(seeds)} eval seeds (mean ± std) ==")
        for mask_name, vals in finals.items():
            lls = np.array([v[0] for v in vals])
            rms = np.array([v[1] for v in vals])
            print(f"{mask_name}: final LL {lls.mean():.4f} ± "
                  f"{lls.std():.4f}, final RMSE {rms.mean():.4f} ± "
                  f"{rms.std():.4f}")

    out_dir = os.path.join(args.run_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "psychometric_curves.npz")
    results["seeds"] = np.array(seeds)   # pairing metadata
    np.savez(path, **results)
    print(f"saved curves to {path}")


if __name__ == "__main__":
    main()
