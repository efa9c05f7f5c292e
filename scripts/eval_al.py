#!/usr/bin/env python
"""Headless active-learning evaluation (replaces notebooks/eval_al.ipynb).

Loads a trained run, rolls out the amortized policy and the baseline
acquisition strategies on fresh GP batches (and optionally the classical
GP baselines and analytic benchmark functions), and saves per-step
log-prob / RMSE curves to ``<run_dir>/eval/al_curves.npz``.

Usage:
    python scripts/eval_al.py RUN_DIR [--batch-size 100] [--T 30]
        [--n-query 500] [--with-gp-baselines] [--benchmark forrester]
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
    ap.add_argument("--n-query", type=int, default=500)
    ap.add_argument("--with-gp-baselines", action="store_true")
    ap.add_argument("--gp-fit-steps", type=int, default=80)
    ap.add_argument("--benchmark", default=None,
                    help="also evaluate OOD on this analytic benchmark")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", default=None,
                    help="comma-separated eval seeds for across-seed error "
                         "bars (overrides --seed); extra seeds' curves are "
                         "saved with a seed{N}_ prefix")
    ap.add_argument("--mask", default="default",
                    choices=("default", "data", "theta"),
                    help="target mask for the curves: 'data' / 'theta' "
                         "select only the data / theta targets (the "
                         "split-mask quality protocol for mix-mode tasks); "
                         "'default' keeps the batch's mask (all targets)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from aline_tpu.eval.al_curves import compare_strategies
    from aline_tpu.eval.gp_al_baselines import compare_acquisition_methods
    from aline_tpu.tasks import build_task
    from aline_tpu.utils.serialization import load_config_and_model

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    task = build_task(cfg.task)
    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [args.seed])

    def apply_mask(batch):
        if args.mask == "default":
            return batch
        import jax.numpy as jnp
        n_d, n_t = batch.n_target_data, batch.n_target - batch.n_target_data
        sel = (jnp.arange(batch.n_target) < n_d)
        mask = sel if args.mask == "data" else ~sel
        return batch.replace(target_mask=mask)

    results = {}
    finals = {}
    for seed in seeds:
        key = jax.random.key(seed)
        k_batch, k_roll = jax.random.split(key)
        batch = apply_mask(task.sample_batch(k_batch, args.batch_size,
                                             n_query=args.n_query))
        curves = compare_strategies(model, params, batch, args.T, k_roll,
                                    time_token=cfg.time_token)
        pre = "" if seed == seeds[0] else f"seed{seed}_"
        for name, out in curves.items():
            lp, rm = np.asarray(out["log_prob"]), np.asarray(out["rmse"])
            results[f"{pre}{name}_log_prob"] = lp
            results[f"{pre}{name}_rmse"] = rm
            finals.setdefault(name, []).append(
                (lp[:, -1].mean(), rm[:, -1].mean()))
            print(f"[seed {seed}] {name}: final log_prob "
                  f"{lp[:, -1].mean():.4f}, final rmse "
                  f"{rm[:, -1].mean():.4f}")
    if len(seeds) > 1:
        print(f"== across {len(seeds)} eval seeds (mean ± std) ==")
        for name, vals in finals.items():
            lls = np.array([v[0] for v in vals])
            rms = np.array([v[1] for v in vals])
            print(f"{name}: final LL {lls.mean():.4f} ± {lls.std():.4f}, "
                  f"final RMSE {rms.mean():.4f} ± {rms.std():.4f}")
    # fresh first-seed batch for the optional classical-baseline /
    # OOD-benchmark sections below
    key = jax.random.key(seeds[0])
    k_batch, k_roll = jax.random.split(key)
    batch = apply_mask(task.sample_batch(k_batch, args.batch_size,
                                         n_query=args.n_query))

    if args.with_gp_baselines and batch.n_target_data > 0:
        gp_res = compare_acquisition_methods(
            batch.x, batch.y, batch.target_x,
            batch.target_all[:, :batch.n_target_data],
            task.n_context_init, args.T, k_roll,
            fit_steps=args.gp_fit_steps)
        for name, out in gp_res.items():
            results[f"gp_{name}_log_prob"] = np.asarray(out["log_prob"])
            results[f"gp_{name}_rmse"] = np.asarray(out["rmse"])
            print(f"gp_{name}: final rmse "
                  f"{results[f'gp_{name}_rmse'][:, -1].mean():.4f}")

    if args.benchmark:
        from aline_tpu.config import BenchmarkTaskConfig
        from aline_tpu.tasks import BenchmarkTask
        bcfg = BenchmarkTaskConfig(
            name="Benchmark", dim_x=cfg.task.dim_x,
            embedding_type=cfg.task.embedding_type,
            n_context_init=cfg.task.n_context_init,
            n_query_init=args.n_query,
            n_target_data=cfg.task.n_target_data,
            n_target_theta=cfg.task.n_target_theta,
            design_scale=cfg.task.design_scale,
            benchmark_name=args.benchmark)
        btask = BenchmarkTask(bcfg)
        bbatch = btask.sample_batch(
            k_batch, args.batch_size,
            mode=("mix" if cfg.task.embedding_type == "mix" else "data"))
        bcurves = compare_strategies(model, params, bbatch, args.T, k_roll,
                                     time_token=cfg.time_token)
        for name, out in bcurves.items():
            results[f"bench_{args.benchmark}_{name}_rmse"] = \
                np.asarray(out["rmse"])

    out_dir = os.path.join(args.run_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    stem = ("al_curves" if args.mask == "default"
            else f"al_curves_{args.mask}_mask")
    out_path = os.path.join(out_dir, f"{stem}.npz")
    results["seeds"] = np.array(seeds)   # pairing metadata
    np.savez(out_path, **results)
    print(f"saved curves to {out_path}")


if __name__ == "__main__":
    main()
