#!/usr/bin/env python
"""HPO-B test-set evaluation with the benchmark's fixed BO initializations.

Implements the reference's ``sample_test_set`` protocol (reference:
tasks/hpo.py:187-243): every (test dataset, seed) pair starts from the
benchmark's fixed initialization rows as context, then the policy (and
the random / GMM-variance-uncertainty baselines) acquires T points from
the real query pool; per-step targeted log-prob and RMSE curves are saved
to ``<run_dir>/eval/hpo_test_curves.npz``.

Usage:
    python scripts/eval_hpo.py RUN_DIR [--T 30] [--n-query 100]
        [--n-target 100]
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
    ap.add_argument("--T", type=int, default=30)
    ap.add_argument("--n-query", type=int, default=100)
    ap.add_argument("--n-target", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", default=None,
                    help="comma-separated eval seeds for across-seed error "
                         "bars (overrides --seed); the test batch is fixed "
                         "by the benchmark, seeds vary the rollout keys")
    ap.add_argument("--meta-dataset", default=None,
                    help="evaluate on a DIFFERENT slice than the one the "
                         "policy was trained on (must share dim_x), e.g. "
                         "the dataset-shift OOD slice 'ranger_shift'")
    ap.add_argument("--out-name", default="hpo_test_curves.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aline_tpu.eval.al_curves import compare_strategies
    from aline_tpu.tasks import build_task
    from aline_tpu.utils.serialization import load_config_and_model

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    if args.meta_dataset:
        print(f"OOD eval: policy trained on {cfg.task.meta_dataset!r}, "
              f"testing on {args.meta_dataset!r}")
        cfg.task.meta_dataset = args.meta_dataset
    task = build_task(cfg.task)
    if task.hpob is None:
        raise RuntimeError("HPO-B data not found under data/HPOB/")

    cx, cy, qx, qy, tx, ty = task.hpob.sample_test_set(
        n_context=task.n_context_init, n_query=args.n_query,
        n_target=args.n_target)
    B = cx.shape[0]
    print(f"test set: {B} (dataset, seed) pairs, "
          f"{cx.shape[1]} fixed init rows, {qx.shape[1]} query rows")

    if task.normalize_y:
        all_y = np.concatenate([cy, qy, ty], axis=1)
        all_y = task.normalise_outcomes(all_y)
        nc, nq = cy.shape[1], qy.shape[1]
        cy, qy, ty = (all_y[:, :nc], all_y[:, nc:nc + nq],
                      all_y[:, nc + nq:])

    x = jnp.asarray(np.concatenate([cx, qx], axis=1))
    y = jnp.asarray(np.concatenate([cy, qy], axis=1))
    batch = task._pack_batch(x, y, jnp.asarray(tx), jnp.asarray(ty),
                             jnp.zeros((B, 0, 1)), None)

    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [args.seed])
    results = {}
    finals = {}
    for seed in seeds:
        curves = compare_strategies(model, params, batch, args.T,
                                    jax.random.key(seed),
                                    time_token=cfg.time_token)
        pre = "" if seed == seeds[0] else f"seed{seed}_"
        for name, out in curves.items():
            lp, rm = np.asarray(out["log_prob"]), np.asarray(out["rmse"])
            results[f"{pre}{name}_log_prob"] = lp
            results[f"{pre}{name}_rmse"] = rm
            finals.setdefault(name, []).append(
                (lp[:, -1].mean(), rm[:, -1].mean()))
            print(f"[seed {seed}] {name}: final log_prob "
                  f"{lp[:, -1].mean():.4f}, "
                  f"final rmse {rm[:, -1].mean():.4f}")
    if len(seeds) > 1:
        print(f"== across {len(seeds)} eval seeds (mean ± std) ==")
        for name, vals in finals.items():
            lls = np.array([v[0] for v in vals])
            rms = np.array([v[1] for v in vals])
            print(f"{name}: final LL {lls.mean():.4f} ± {lls.std():.4f}, "
                  f"final RMSE {rms.mean():.4f} ± {rms.std():.4f}")

    out_dir = os.path.join(args.run_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, args.out_name)
    results["seeds"] = np.array(seeds)   # pairing metadata
    np.savez(out_path, **results)
    print("saved", out_path)


if __name__ == "__main__":
    main()
