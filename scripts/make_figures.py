#!/usr/bin/env python
"""Render headline figures from committed eval artifacts (headless).

The reference produces its figures inside notebooks from artifacts that
are gitignored and absent (reference: notebooks/eval_*.ipynb,
.gitignore:36-38); here every figure regenerates from the committed
`benchmarks/artifacts/` files, so the plots are reproducible with no
trained model or TPU in the loop.

Usage: python scripts/make_figures.py [--out docs/figures]
Skips any figure whose artifact is missing.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re

import numpy as np  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "artifacts")


def _load(name):
    path = os.path.join(ART, name)
    return dict(np.load(path)) if os.path.exists(path) else None


def _pool_seeds(d, key):
    """Concatenate [B, T+1] curves across eval seeds, if present.

    Seed prefixes are discovered from the keys (first seed unprefixed,
    later ones by seed VALUE, ``seed{N}_``) so non-contiguous seed lists
    pool correctly.
    """
    pres = [""] + sorted({m.group(0) for k in d
                          if (m := re.match(r"seed\d+_", k))})
    parts = [d[f"{p}{key}"] for p in pres if f"{p}{key}" in d]
    return np.concatenate(parts) if parts else None


def _band(ax, curves, label, color):
    mean = curves.mean(0)
    se = curves.std(0) / np.sqrt(curves.shape[0])
    steps = np.arange(curves.shape[1])
    ax.plot(steps, mean, label=label, color=color)
    ax.fill_between(steps, mean - se, mean + se, color=color, alpha=0.2)


def fig_loc_spce(plt, PALETTE, out):
    pol = _load("loc_r4_100k_N2000_T35_L1e6.npz")
    rnd = _load("loc_r3_random_N2000_T35_L1e6.npz")
    if pol is None or rnd is None:
        return
    fig, ax = plt.subplots(figsize=(5.2, 3.4))
    for d, pre, label, c in ((pol, "", "ALINE policy (100k)", PALETTE[0]),
                             (rnd, "random_", "random designs", PALETTE[1])):
        pce_m, pce_e = d[f"{pre}pce_mean"], d[f"{pre}pce_err"]
        steps = np.arange(1, len(pce_m) + 1)
        ax.plot(steps, pce_m, label=f"{label} sPCE", color=c)
        ax.fill_between(steps, pce_m - pce_e, pce_m + pce_e, color=c,
                        alpha=0.25)
        ax.plot(steps, d[f"{pre}nmc_mean"], color=c, ls="--", alpha=0.6,
                label=f"{label} sNMC")
    ax.set_xlabel("experiment step")
    ax.set_ylabel("EIG bound (nats)")
    ax.set_title("Location finding, T=35, L=1e6, M=2000")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "loc_spce.png"))
    plt.close(fig)
    print("wrote loc_spce.png")


def fig_psych_psi(plt, PALETTE, out):
    pol = _load("psych_r4_100k_curves.npz")
    psi = _load("psych_psi_curves.npz")
    if pol is None or psi is None:
        return
    fig, axes = plt.subplots(1, 2, figsize=(8.6, 3.4))
    mask = "threshold_slope"
    for ax, metric, ylabel in ((axes[0], "log_prob",
                                "targeted log-likelihood"),
                               (axes[1], "rmse", "targeted RMSE")):
        _band(ax, _pool_seeds(pol, f"{mask}_{metric}"),
              "ALINE policy (amortized)", PALETTE[0])
        _band(ax, _pool_seeds(psi, f"{mask}_psi_{metric}"),
              "QUEST+/PSI (grid Bayes)", PALETTE[2])
        _band(ax, _pool_seeds(psi, f"{mask}_random_{metric}"),
              "random designs (grid Bayes)", PALETTE[1])
        ax.set_xlabel("trial")
        ax.set_ylabel(ylabel)
    axes[0].legend(fontsize=8)
    fig.suptitle("Psychometric threshold+slope targets, 300 subjects")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "psych_psi.png"))
    plt.close(fig)
    print("wrote psych_psi.png")


def fig_hpo(plt, PALETTE, out):
    d = _load("hpo_r4_svm_test_curves.npz")
    if d is None:
        return
    fig, ax = plt.subplots(figsize=(5.2, 3.4))
    for strat, c in (("aline", PALETTE[0]), ("random", PALETTE[1]),
                     ("uncertainty", PALETTE[3])):
        _band(ax, _pool_seeds(d, f"{strat}_log_prob"), strat, c)
    ax.set_xlabel("acquisition step")
    ax.set_ylabel("test log-likelihood")
    ax.set_title("HPO-B svm surrogate, fixed-BO-init test protocol")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "hpo_svm.png"))
    plt.close(fig)
    print("wrote hpo_svm.png")


def fig_al1d(plt, PALETTE, out):
    """Flagship split-mask eval curves (policy artifact-of-record)."""
    fig, axes = plt.subplots(1, 2, figsize=(8.6, 3.4))
    found = False
    for ax, mask in ((axes[0], "data"), (axes[1], "theta")):
        d = _load(f"al1d_r4_{mask}_mask.npz")
        if d is None:
            continue
        found = True
        for strat, c in (("aline", PALETTE[0]), ("random", PALETTE[1]),
                         ("uncertainty", PALETTE[3])):
            cur = _pool_seeds(d, f"{strat}_log_prob")
            if cur is not None:
                _band(ax, cur, strat, c)
        ax.set_xlabel("acquisition step")
        ax.set_ylabel(f"{mask}-mask log-likelihood")
    if not found:
        plt.close(fig)
        return
    axes[0].legend(fontsize=8)
    fig.suptitle("GP-AL-1D flagship (200k), split-mask objectives")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "al1d_split.png"))
    plt.close(fig)
    print("wrote al1d_split.png")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/figures")
    args = ap.parse_args()
    from aline_tpu.utils.plotting import PALETTE, apply_style, plt
    if plt is None:
        sys.exit("matplotlib unavailable")
    apply_style()
    os.makedirs(args.out, exist_ok=True)
    fig_loc_spce(plt, PALETTE, args.out)
    fig_psych_psi(plt, PALETTE, args.out)
    fig_hpo(plt, PALETTE, args.out)
    fig_al1d(plt, PALETTE, args.out)


if __name__ == "__main__":
    main()
