#!/usr/bin/env python
"""Per-config training-budget + plateau report (round-3 VERDICT #5).

For each training run dir, reads metrics.jsonl and reports, for the
prediction-likelihood trajectory (the metric the quality tables track):

* budget: trained epochs vs the reference README recipe
  (reference: README.md:30-56),
* plateau: least-squares slope of LL over the final 10k/20k epochs, with
  the residual std of the fit for scale (slope ≪ residual noise ⇒
  plateaued; the location-finding standard from round 2).

Usage: python scripts/plateau_report.py [run_dir ...]
Defaults to the five canonical round-2/3 runs.
"""
import json
import os
import sys

import numpy as np

# (run_dir, config label, reference-recipe epochs, reference README line)
DEFAULT_RUNS = [
    ("outputs/al1d_r4_full", "GP-AL-1D full budget", 200_000, "README.md:35"),
    ("outputs/ces_r4_full", "CES full budget", 200_000, "README.md:50"),
    ("outputs/loc_r4_full", "loc finding full budget", 100_000, "README.md:45"),
    ("outputs/psych_r4_full", "psychometric full budget", 100_000, "README.md:55"),
    ("outputs/al1d_r3_bf16", "GP-AL-1D (al_mix dx=1)", 200_000, "README.md:35"),
    ("outputs/al1d_r2_bf16", "GP-AL-1D r2 (60k)", 200_000, "README.md:35"),
    ("outputs/al2d_r3_bf16", "GP-AL-2D (al_mix dx=2)", 200_000, "README.md:40"),
    ("outputs/loc_r2_bf16", "location finding", 100_000, "README.md:45"),
    ("outputs/ces_r3_bf16", "CES", 200_000, "README.md:50"),
    ("outputs/ces_r2_bf16", "CES r2 (80k)", 200_000, "README.md:50"),
    ("outputs/psych_r3_3mask", "psychometric (3-mask)", 100_000, "README.md:55"),
    ("outputs/psych_r2_bf16", "psychometric r2", 100_000, "README.md:55"),
    ("outputs/hpo_r3_calib", "HPO-B ranger (std_min .05)", None, "-"),
]


def analyze(run_dir, label, ref_epochs, ref_line):
    if run_dir.endswith(".jsonl"):
        path = run_dir
    else:
        path = os.path.join(run_dir, "metrics.jsonl")
        if not os.path.exists(path):
            # run dirs don't survive host resets; fall back to the
            # committed trajectory copy in benchmarks/artifacts/
            alt = os.path.join("benchmarks", "artifacts",
                               os.path.basename(run_dir) + "_metrics.jsonl")
            if os.path.exists(alt):
                path = alt
    if not os.path.exists(path):
        return None
    steps, ll = [], []
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if d.get("_type") == "metrics" and "likelihood" in d:
                steps.append(d["step"])
                ll.append(d["likelihood"])
    if len(steps) < 6:
        return None
    steps, ll = np.asarray(steps, float), np.asarray(ll, float)
    order = np.argsort(steps)
    steps, ll = steps[order], ll[order]
    # de-duplicate resume overlaps: keep the LAST record per step
    _, last_idx = np.unique(steps[::-1], return_index=True)
    keep = len(steps) - 1 - last_idx
    steps, ll = steps[np.sort(keep)], ll[np.sort(keep)]
    last = steps[-1]
    rows = {}
    for w in (10_000, 20_000):
        m = steps >= last - w
        if m.sum() >= 4:
            coef = np.polyfit(steps[m], ll[m], 1)
            resid = ll[m] - np.polyval(coef, steps[m])
            rows[w] = (coef[0] * 10_000, float(np.std(resid)), int(m.sum()))
    return dict(label=label, run=run_dir, epochs=int(last),
                ref_epochs=ref_epochs, ref_line=ref_line,
                final_ll=float(ll[-5:].mean()), windows=rows)


def main():
    runs = sys.argv[1:]
    table = ([analyze(r, r, None, "-") for r in runs] if runs else
             [analyze(*r) for r in DEFAULT_RUNS])
    print(f"{'config':<28} {'epochs':>7} {'budget':>7} {'LL(last5)':>9} "
          f"{'slope/10k (last10k)':>20} {'resid σ':>8} {'plateau?':>9}")
    for r in table:
        if r is None:
            continue
        budget = (f"{100 * r['epochs'] / r['ref_epochs']:.0f}%"
                  if r["ref_epochs"] else "-")
        w = r["windows"].get(10_000) or r["windows"].get(20_000)
        if w is None:
            print(f"{r['label']:<28} {r['epochs']:>7} {budget:>7} "
                  f"{r['final_ll']:>9.3f} {'(too few points)':>20}")
            continue
        slope, sigma, n = w
        flat = "yes" if abs(slope) < sigma else "no"
        print(f"{r['label']:<28} {r['epochs']:>7} {budget:>7} "
              f"{r['final_ll']:>9.3f} {slope:>+20.4f} {sigma:>8.3f} "
              f"{flat:>9} (n={n}, ref {r['ref_line']})")


if __name__ == "__main__":
    main()
