#!/usr/bin/env python
"""QUEST+/PSI external-baseline evaluation for the psychometric task.

Runs the native grid-Bayes PSI baseline (aline_tpu/eval/psi.py) and a
random-design control with the SAME protocol, seeds and pre-simulated
subjects as scripts/eval_psychometric.py, so the trained ALINE policy's
curves (e.g. benchmarks/artifacts/psych_r4_100k_curves.npz) pair
per-subject with these.

The reference's own comparison loads precomputed QuestPlus/PSI .npy
results that are absent from its snapshot (reference:
notebooks/eval_psychometric.ipynb cell 3); this script regenerates the
baseline from first principles instead.

Usage:
    python scripts/eval_psi.py [RUN_DIR] [--T 30] [--batch-size 100]
        [--seeds 0,1,2] [--policy-npz benchmarks/artifacts/psych_...npz]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default="checkpoints/psych_100k",
                    help="run dir whose config defines the task protocol")
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--T", type=int, default=30)
    ap.add_argument("--n-query", type=int, default=300)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--grid", default="33,17,9,7",
                    help="grid points per theta axis (alpha,beta,gamma,lambda)")
    ap.add_argument("--b-chunk", type=int, default=4)
    ap.add_argument("--policy-npz", default=None,
                    help="eval_psychometric.py artifact to pair against")
    ap.add_argument("--out", default="benchmarks/artifacts/psych_psi_curves.npz")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")   # grid Bayes is CPU-cheap

    import jax
    import numpy as np

    from aline_tpu.eval.psi import make_theta_grid, psi_rollout_curves
    from aline_tpu.tasks import build_task
    from aline_tpu.utils.serialization import load_config

    cfg = load_config(args.run_dir)
    task = build_task(cfg.task)
    seeds = [int(s) for s in args.seeds.split(",")]
    grid = make_theta_grid(task, tuple(int(n) for n in args.grid.split(",")))

    masks = {
        "threshold_slope": np.array([True, True, False, False]),
        "guess_lapse": np.array([False, False, True, True]),
        "all": np.ones(4, bool),
    }
    policy = None
    if args.policy_npz and os.path.exists(args.policy_npz):
        policy = dict(np.load(args.policy_npz))
        # The first eval seed's curves are keyed UNPREFIXED in both
        # artifacts, so pairing is only valid when the seed lists match
        # (newer artifacts carry a 'seeds' array; otherwise infer the
        # later seeds from the seed{N}_ key prefixes).
        if "seeds" in policy:
            pol_seeds = [int(s) for s in policy.pop("seeds")]
        else:
            import re
            later = sorted({int(m.group(1)) for k in policy
                            if (m := re.match(r"seed(\d+)_", k))})
            pol_seeds = None if not later else [None] + later
        if pol_seeds is not None and (
                pol_seeds[1:] != seeds[1:] or
                (pol_seeds[0] is not None and pol_seeds[0] != seeds[0])):
            sys.exit(f"--policy-npz seed list {pol_seeds} does not match "
                     f"--seeds {seeds}; paired deltas would mispair")

    results, finals = {}, {}
    for seed in seeds:
        key = jax.random.key(seed)
        k_batch, k_roll = jax.random.split(key)   # = eval_psychometric.py
        pre = "" if seed == seeds[0] else f"seed{seed}_"
        batch = task.sample_batch(k_batch, args.batch_size,
                                  n_query=args.n_query)
        for mask_name, mask in masks.items():
            for strat in ("psi", "random"):
                out = psi_rollout_curves(task, batch, args.T, k_roll,
                                         mask=mask, strategy=strat,
                                         grid=grid, b_chunk=args.b_chunk)
                lp, rm = out["log_prob"], out["rmse"]
                results[f"{pre}{mask_name}_{strat}_log_prob"] = lp
                results[f"{pre}{mask_name}_{strat}_rmse"] = rm
                finals.setdefault((mask_name, strat), []).append(
                    (lp[:, -1], rm[:, -1]))
                line = (f"[seed {seed}] mask {mask_name} {strat}: "
                        f"final LL {lp[:, -1].mean():.4f} "
                        f"final RMSE {rm[:, -1].mean():.4f}")
                if policy is not None and strat == "psi":
                    pl = policy.get(f"{pre}{mask_name}_log_prob")
                    if pl is not None and pl.shape[0] == lp.shape[0]:
                        d = lp[:, -1] - pl[:, -1]
                        se = d.std(ddof=1) / np.sqrt(len(d))
                        line += (f" | paired dLL(psi - policy) "
                                 f"{d.mean():+.4f} ± {se:.4f}")
                print(line, flush=True)

    print(f"== across {len(seeds)} eval seeds (mean ± std of final) ==")
    for (mask_name, strat), vals in finals.items():
        lls = np.array([v[0].mean() for v in vals])
        rms = np.array([v[1].mean() for v in vals])
        print(f"{mask_name:>16s} {strat:>6s}: LL {lls.mean():.4f} ± "
              f"{lls.std():.4f}  RMSE {rms.mean():.4f} ± {rms.std():.4f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    results["seeds"] = np.array(seeds)   # pairing metadata
    np.savez(args.out, **results)
    print(f"saved curves to {args.out}")


if __name__ == "__main__":
    main()
