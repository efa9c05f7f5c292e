#!/usr/bin/env python
"""Assemble the bf16-promotion evidence artifact (VERDICT round-1 item 4).

Compares the 60k-epoch bf16 flagship run against the round-1 f32 run on
the phase-matched segment (both runs share seed 123 and are in the
burning phase for epochs 0..3000; beyond that the runs use different
burning budgets so trajectories are not directly comparable), and
records the bf16 run's full-trajectory stability.  Writes
benchmarks/artifacts/bf16_convergence.npz and prints the comparison.

Usage: python scripts/bf16_evidence.py [--f32 benchmarks/artifacts/al1d_v2_metrics.jsonl]
                                       [--bf16 outputs/al1d_r2_bf16/metrics.jsonl]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_metrics(path):
    steps, ll = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("_type") == "metrics":
                steps.append(rec["step"])
                ll.append(rec["likelihood"])
    return np.asarray(steps), np.asarray(ll)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", default="benchmarks/artifacts/al1d_v2_metrics.jsonl")
    ap.add_argument("--bf16", default="outputs/al1d_r2_bf16/metrics.jsonl")
    ap.add_argument("--phase-matched-until", type=int, default=3000)
    args = ap.parse_args()

    s32, l32 = load_metrics(args.f32)
    s16, l16 = load_metrics(args.bf16)

    # phase-matched burning segment (same seed, same phase, same config
    # apart from dtype)
    cut = args.phase_matched_until
    m32 = {int(s): v for s, v in zip(s32, l32) if s <= cut}
    m16 = {int(s): v for s, v in zip(s16, l16) if s <= cut}
    common = sorted(set(m32) & set(m16))
    print("phase-matched burning segment (epochs 0..%d):" % cut)
    diffs = []
    for s in common:
        d = m16[s] - m32[s]
        diffs.append(d)
        print(f"  epoch {s:5d}: f32 LL {m32[s]:8.4f}   bf16 LL {m16[s]:8.4f}"
              f"   delta {d:+.4f}")
    diffs = np.asarray(diffs)
    # per-epoch likelihood noise between neighboring logged epochs (both
    # runs draw a fresh random batch per epoch, so this is the natural
    # comparison scale)
    noise32 = np.std(np.diff(l32[: len(l32) // 2]))
    print(f"\nmax |delta| {np.abs(diffs).max():.4f}  vs  per-log-point "
          f"f32 trajectory noise sigma {noise32:.4f}")

    print(f"\nbf16 full trajectory: {len(s16)} points to epoch "
          f"{s16.max()}, final-5 mean LL {l16[-5:].mean():.4f} "
          f"(finite: {np.isfinite(l16).all()})")

    out = "benchmarks/artifacts/bf16_convergence.npz"
    np.savez(out, f32_steps=s32, f32_ll=l32, bf16_steps=s16, bf16_ll=l16,
             matched_steps=np.asarray(common), matched_delta=diffs)
    print("saved", out)
    ok = np.abs(diffs).max() < 3 * noise32 and np.isfinite(l16).all()
    print("VERDICT:", "bf16 tracks f32 within trajectory noise"
          if ok else "bf16 deviates beyond noise — keep f32 default")


if __name__ == "__main__":
    main()
