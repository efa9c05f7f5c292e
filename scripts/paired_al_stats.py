#!/usr/bin/env python3
"""Paired per-problem statistics for AL-curve evaluations.

Same treatment the HPO-B scoreboard got in round 4
(scripts/paired_hpo_stats.py): within an eval seed every strategy rolls
out on the SAME sampled problem batch (eval_al.py / compare_strategies),
so per-problem paired differences Δ_b = policy_b − baseline_b with a
bootstrap CI over problems are the right statistic; seeds use fresh
batches, so per-problem deltas concatenate across seeds as independent
paired observations.

Usage:
    python scripts/paired_al_stats.py ARTIFACT.npz [ARTIFACT2.npz ...]
        [--policy aline] [--out benchmarks/artifacts/al_paired_stats.json]

Defaults to the GP-AL-1D split-mask artifacts of record.
"""
import argparse
import json
import os
import re

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "benchmarks", "artifacts")
N_BOOT = 20_000


def seed_prefixes(d):
    """Seed prefixes actually present in the artifact.

    eval_al.py / eval_psychometric.py / eval_psi.py key the first eval
    seed unprefixed and every later one by seed VALUE (``seed{N}_``), so
    non-contiguous seed lists (e.g. --seeds 0,5,7) must be discovered
    from the keys, not enumerated by index.
    """
    pres = {""}
    for k in d:
        m = re.match(r"seed\d+_", k)
        if m:
            pres.add(m.group(0))
    return sorted(pres)


def paired_final_deltas(d, policy, base, metric):
    """Concatenate per-problem final-step deltas across eval seeds."""
    deltas = []
    for pre in seed_prefixes(d):
        kp, kb = f"{pre}{policy}_{metric}", f"{pre}{base}_{metric}"
        if kp in d and kb in d:
            deltas.append(d[kp][:, -1] - d[kb][:, -1])
    return np.concatenate(deltas) if deltas else None


def bootstrap_ci(delta, rng, n=N_BOOT):
    B = delta.shape[0]
    idx = rng.integers(0, B, size=(n, B))
    return np.percentile(delta[idx].mean(1), [2.5, 97.5])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="*",
                    default=["al1d_r3_data_mask.npz",
                             "al1d_r3_theta_mask.npz"])
    ap.add_argument("--policy", default="aline")
    ap.add_argument("--out",
                    default=os.path.join(ART, "al_paired_stats.json"))
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    rows = []
    print("| artifact | baseline | paired ΔLL (95% CI) | LL wins/B "
          "| paired ΔRMSE (95% CI) | RMSE wins/B |")
    print("|---|---|---|---|---|---|")
    for name in args.artifacts:
        path = name if os.path.exists(name) else os.path.join(ART, name)
        d = dict(np.load(path))
        strategies = sorted({re.sub(r"^seed\d+_", "",
                                    k[:-len("_log_prob")])
                             for k in d if k.endswith("_log_prob")})
        for base in strategies:
            if base == args.policy:
                continue
            dll = paired_final_deltas(d, args.policy, base, "log_prob")
            if dll is None:
                continue
            # RMSE: lower is better -> positive Δ = policy wins
            drm = -paired_final_deltas(d, args.policy, base, "rmse")
            ll_ci = bootstrap_ci(dll, rng)
            rm_ci = bootstrap_ci(drm, rng)
            short = os.path.basename(path).replace(".npz", "")
            rows.append(dict(
                artifact=short, baseline=base, B=int(dll.shape[0]),
                dll_mean=float(dll.mean()),
                dll_ci=[float(c) for c in ll_ci],
                ll_wins=int((dll > 0).sum()),
                drmse_mean=float(drm.mean()),
                drmse_ci=[float(c) for c in rm_ci],
                rmse_wins=int((drm > 0).sum())))
            r = rows[-1]
            print(f"| {short} | {base} | {r['dll_mean']:+.3f} "
                  f"[{ll_ci[0]:+.3f}, {ll_ci[1]:+.3f}] "
                  f"| {r['ll_wins']}/{r['B']} | {r['drmse_mean']:+.4f} "
                  f"[{rm_ci[0]:+.4f}, {rm_ci[1]:+.4f}] "
                  f"| {r['rmse_wins']}/{r['B']} |")
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
