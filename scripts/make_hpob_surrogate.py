#!/usr/bin/env python
"""Generate a format-exact surrogate HPO-B meta-dataset slice.

The real HPO-B meta-dataset (Arango et al., 2021) is distributed as
~1.4 GB of JSON that cannot be fetched in this zero-egress environment
(the reference repo gitignores its copy, reference: .gitignore:36-38).
This script synthesizes a drop-in replacement for the 'ranger' search
space (id 7609, 6-D per reference config/task/hpo.yaml:6) in the exact file layout the loaders consume:

    data/HPOB/ranger.json             {dataset_id: {"X": [[...]], "y": [[...]]}}
    data/HPOB/ranger_test.json        same, held-out datasets
    data/HPOB/bo-initializations.json {space_id: {dataset_id: {testN: [idx]}}}

Response surfaces mimic HPO accuracy landscapes: a bounded sigmoid of a
smooth random quadratic-plus-RBF-mixture surface with per-dataset optima,
plateaus, low-signal dims and heteroscedastic noise.  Swapping in the
real HPO-B JSONs requires zero code changes.

Run:  python scripts/make_hpob_surrogate.py [--out data]
"""
import argparse
import json
import os

import numpy as np


def make_surface(rng, dim, shift=False):
    """Random smooth response surface on [0,1]^dim -> [0,1].

    ``shift=True`` draws the surface HYPERPRIORS from a different
    distribution (sharper optima, more kernels, noisier and fewer
    relevant dims) — used to build a held-out dataset-shift test split
    whose response-surface family differs from the meta-train one."""
    n_kernels = rng.integers(6, 13) if shift else rng.integers(3, 8)
    centers = rng.uniform(0, 1, (n_kernels, dim))
    widths = (rng.uniform(0.06, 0.25, (n_kernels, dim)) if shift
              else rng.uniform(0.15, 0.6, (n_kernels, dim)))
    amps = (rng.uniform(-2.5, 3.5, n_kernels) if shift
            else rng.uniform(-1.5, 2.5, n_kernels))
    # a few dims are near-irrelevant, as in real HPO spaces
    relevance = (rng.uniform(size=dim) < (0.5 if shift else 0.7)
                 ).astype(float)
    relevance = np.maximum(relevance, 0.05)
    lin = rng.normal(0, 0.3, dim) * relevance
    bias = rng.normal(0.5, 0.6)
    noise = (rng.uniform(0.02, 0.08) if shift
             else rng.uniform(0.005, 0.03))

    def f(X, rng_eval):
        d2 = (((X[:, None, :] - centers[None]) * relevance /
               widths[None]) ** 2).sum(-1)
        smooth = (amps[None] * np.exp(-0.5 * d2)).sum(-1)
        val = bias + smooth + X @ lin
        acc = 1.0 / (1.0 + np.exp(-val))
        return np.clip(acc + rng_eval.normal(0, noise, len(acc)), 0.0, 1.0)

    return f


def make_dataset(rng, dim, n_evals, shift=False):
    f = make_surface(rng, dim, shift=shift)
    X = rng.uniform(0, 1, (n_evals, dim))
    y = f(X, rng)
    return {"X": np.round(X, 6).tolist(),
            "y": np.round(y[:, None], 6).tolist()}


# search-space dims per the reference (reference: config/task/hpo.yaml:6
# "glmnet=5, ranger=6, svm=4, rpart=4, xgboost=6") and their HPO-B space
# ids (reference: tasks/hpo.py:128)
SPACES = {"ranger": ("7609", 6), "glmnet": ("5860", 5), "svm": ("5891", 4),
          "rpart": ("5859", 4), "xgboost": ("5971", 6)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"))
    ap.add_argument("--space", default="ranger", choices=sorted(SPACES))
    ap.add_argument("--seed", type=int, default=None,
                    help="defaults to the numeric HPO-B space id")
    ap.add_argument("--variant", default=None, choices=[None, "shift"],
                    help="'shift': write a <space>_shift slice whose TEST "
                         "datasets come from a shifted response-surface "
                         "family (dataset-shift OOD split) with ragged "
                         "test sizes; meta-train stays the nominal family")
    args = ap.parse_args()
    space_id, dim = SPACES[args.space]
    slice_name = args.space if args.variant is None else \
        f"{args.space}_{args.variant}"
    # slice variants key bo-initializations by slice NAME (the task-side
    # loader falls back to the name when no numeric space id is known)
    space_key = space_id if args.variant is None else slice_name
    rng = np.random.default_rng(args.seed if args.seed is not None
                                else int(space_id) +
                                (0 if args.variant is None else 1))
    out = os.path.join(args.out, "HPOB")
    os.makedirs(out, exist_ok=True)

    train = {str(8000 + i): make_dataset(rng, dim,
                                         int(rng.integers(250, 500)))
             for i in range(32)}
    with open(os.path.join(out, f"{slice_name}.json"), "w") as fh:
        json.dump(train, fh)

    shift = args.variant == "shift"
    test = {str(9000 + i): make_dataset(
        rng, dim, int(rng.integers(350, 800)) if shift else 500,
        shift=shift) for i in range(6)}
    with open(os.path.join(out, f"{slice_name}_test.json"), "w") as fh:
        json.dump(test, fh)

    # 5 fixed BO-initialization index lists per test dataset (the real
    # benchmark ships exactly this structure, reference: tasks/hpo.py:187-243)
    # — merged into the shared bo-initializations.json across spaces
    bo_path = os.path.join(out, "bo-initializations.json")
    bo = {}
    if os.path.exists(bo_path):
        with open(bo_path) as fh:
            bo = json.load(fh)
    bo[space_key] = {did: {f"test{s}": sorted(
        rng.choice(len(d["X"]), 5, replace=False).tolist())
        for s in range(5)} for did, d in test.items()}
    with open(bo_path, "w") as fh:
        json.dump(bo, fh)

    sizes = {p: os.path.getsize(os.path.join(out, p)) // 1024
             for p in os.listdir(out)}
    print("written:", sizes, "KiB")


if __name__ == "__main__":
    main()
