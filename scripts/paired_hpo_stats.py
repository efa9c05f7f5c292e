#!/usr/bin/env python3
"""Paired per-problem statistics for the HPO-B scoreboard (VERDICT r3
item 5).

The round-3 scoreboard reported independent mean ± σ columns per
strategy; since every strategy runs on the SAME fixed-BO-init test
problems (reference: tasks/hpo.py:187-243 sample_test_set), the right
statistic is the per-problem paired difference Δ_b = policy_b − baseline_b
with a bootstrap CI over problems — paired tests remove the shared
across-problem variance that dominates the unpaired σ.

Pure CPU, reads the committed eval artifacts
(benchmarks/artifacts/hpo_*_test_curves.npz, written by
scripts/eval_hpo.py). Writes a markdown table to stdout and
benchmarks/artifacts/hpo_paired_stats.json.
"""
import json
import os
import sys

import re

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "benchmarks", "artifacts")

# space -> the artifact the round-3/4 scoreboard quotes
SPACES = {
    "ranger": "hpo_r3_calib_test_curves.npz",
    "svm": "hpo_r3_svm_test_curves.npz",
    "glmnet": "hpo_r3_glmnet_test_curves.npz",
    "rpart": "hpo_r4_rpart45k_test_curves.npz",
    "xgboost": "hpo_r3_xgboost_test_curves.npz",
}
BASELINES = ("random", "uncertainty")
N_BOOT = 20_000


def seed_mean_final(d, strat, metric):
    """Per-problem final-step value, averaged over eval seeds: [B].

    Seed prefixes are discovered from the keys (first seed unprefixed,
    later ones keyed by seed VALUE, ``seed{N}_``), so non-contiguous
    --seeds lists average correctly.
    """
    pres = [""] + sorted({m.group(0) for k in d
                          if (m := re.match(r"seed\d+_", k))})
    mats = [d[f"{p}{strat}_{metric}"] for p in pres
            if f"{p}{strat}_{metric}" in d]
    return np.stack(mats).mean(0)[:, -1]


def bootstrap_ci(delta, rng, n=N_BOOT):
    B = delta.shape[0]
    idx = rng.integers(0, B, size=(n, B))
    means = delta[idx].mean(1)
    return np.percentile(means, [2.5, 97.5])


def main():
    rng = np.random.default_rng(0)
    rows = []
    print("| space | baseline | paired ΔLL (95% CI) | LL wins/B "
          "| paired ΔRMSE (95% CI) | RMSE wins/B |")
    print("|---|---|---|---|---|---|")
    for space, fname in SPACES.items():
        path = os.path.join(ART, fname)
        if not os.path.exists(path):
            print(f"MISSING {path}", file=sys.stderr)
            continue
        d = np.load(path)
        pol_ll = seed_mean_final(d, "aline", "log_prob")
        pol_rm = seed_mean_final(d, "aline", "rmse")
        for base in BASELINES:
            dll = pol_ll - seed_mean_final(d, base, "log_prob")
            # RMSE: lower is better -> positive Δ = policy wins
            drm = seed_mean_final(d, base, "rmse") - pol_rm
            ll_ci = bootstrap_ci(dll, rng)
            rm_ci = bootstrap_ci(drm, rng)
            row = dict(space=space, baseline=base, artifact=fname,
                       B=int(dll.shape[0]),
                       dll_mean=float(dll.mean()),
                       dll_ci=[float(c) for c in ll_ci],
                       ll_wins=int((dll > 0).sum()),
                       drmse_mean=float(drm.mean()),
                       drmse_ci=[float(c) for c in rm_ci],
                       rmse_wins=int((drm > 0).sum()))
            rows.append(row)
            sig_ll = "**" if ll_ci[0] > 0 else ("†" if ll_ci[1] < 0 else "")
            sig_rm = "**" if rm_ci[0] > 0 else ("†" if rm_ci[1] < 0 else "")
            print(f"| {space} | {base} | "
                  f"{sig_ll}{dll.mean():+.3f}{sig_ll} "
                  f"[{ll_ci[0]:+.3f}, {ll_ci[1]:+.3f}] | "
                  f"{row['ll_wins']}/{row['B']} | "
                  f"{sig_rm}{drm.mean():+.4f}{sig_rm} "
                  f"[{rm_ci[0]:+.4f}, {rm_ci[1]:+.4f}] | "
                  f"{row['rmse_wins']}/{row['B']} |")
    print("\n`**` = paired 95% CI excludes 0 in the policy's favor; "
          "`†` = excludes 0 against the policy.")
    out = os.path.join(ART, "hpo_paired_stats.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("saved", out, file=sys.stderr)


if __name__ == "__main__":
    main()
