#!/usr/bin/env python3
"""Training-seed variance on FINAL EVAL metrics (round-2 VERDICT weak #6).

Round 2 measured seed spread on the in-training LL at 5k epochs only
(benchmarks/artifacts/al1d_seed_variance.npz). This report instead takes
three independently trained 5k-epoch GP-AL-1D runs (seeds 8/9/10, lane Z)
through the round-1 split-mask *final eval* protocol (eval_al.py, data
mask, 200 problems, T=30, n_query=500) and reports the across-training-
seed spread of the final LL/RMSE — the quantity the quality tables
actually report.

Usage: python scripts/seed_variance_report.py [seed ...]  (default 8 9 10)
Reads  outputs/al1d_seed{S}/eval/al_curves_data_mask.npz
Writes benchmarks/artifacts/al1d_r3_final_eval_seed_variance.npz
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [8, 9, 10]
    rows = {}
    out = {"seeds": np.array(seeds)}
    for s in seeds:
        path = os.path.join(REPO, f"outputs/al1d_seed{s}/eval/"
                            "al_curves_data_mask.npz")
        d = np.load(path)
        for name in ("aline", "random", "uncertainty"):
            lp = d[f"{name}_log_prob"]
            rm = d[f"{name}_rmse"]
            rows.setdefault(name, []).append(
                (lp[:, -1].mean(), rm[:, -1].mean()))
            out[f"seed{s}_{name}_log_prob"] = lp
            out[f"seed{s}_{name}_rmse"] = rm
    print(f"GP-AL-1D 5k epochs x {len(seeds)} training seeds "
          "(data mask, final step):")
    for name, vals in rows.items():
        ll = np.array([v[0] for v in vals])
        rm = np.array([v[1] for v in vals])
        out[f"{name}_final_ll"] = ll
        out[f"{name}_final_rmse"] = rm
        print(f"  {name:>12}: LL {ll.mean():+.4f} ± {ll.std():.4f} "
              f"(range {ll.min():+.4f}..{ll.max():+.4f})   "
              f"RMSE {rm.mean():.4f} ± {rm.std():.4f}")
    dest = os.path.join(REPO, "benchmarks/artifacts/"
                        "al1d_r3_final_eval_seed_variance.npz")
    np.savez(dest, **out)
    print(f"saved {dest}")


if __name__ == "__main__":
    main()
