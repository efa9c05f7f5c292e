#!/usr/bin/env python
"""Acquisition-behavior diagnostic for HPO-B policies (round-3 rpart probe).

Observation (docs/PERFORMANCE.md, five-space table): on the rpart search
space the trained policy beats random on both metrics but GMM-variance
uncertainty sampling beats the policy on targeted LL (+0.410 vs +0.294),
uniquely among the five spaces. This script measures WHAT the policy
acquires, on the same fixed-BO-init test protocol the quality tables use
(reference protocol: tasks/hpo.py:187-243):

per step t and dataset b, with the current posterior over the query pool:
  * var_rank  — rank of the policy's chosen point in the pool's
                predictive-variance ordering (0 = it chose the argmax-
                variance point, i.e. exactly what uncertainty sampling
                would do; pool_size-1 = the most confident point)
  * std_ratio — predictive std at the chosen point / pool max std
  * match     — fraction of steps where the policy picked the top-
                variance point outright

plus the same per-step targeted LL/RMSE curves as eval_hpo, so the
acquisition stats line up with the quality outcome.

Usage: JAX_PLATFORMS=cpu python scripts/diag_hpo_acq.py CKPT_DIR \
           [--file-name aline_hpo_rpart] [--T 30]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--file-name", default="aline")
    ap.add_argument("--T", type=int, default=30)
    ap.add_argument("--n-query", type=int, default=100)
    ap.add_argument("--n-target", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aline_tpu.distributions.gmm import gmm_log_prob, gmm_variance
    from aline_tpu.tasks import build_task
    from aline_tpu.tasks.base import init_ctx_idx, select_design
    from aline_tpu.utils.serialization import load_config_and_model

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    task = build_task(cfg.task)
    if task.hpob is None:
        raise RuntimeError("HPO-B data not found under data/HPOB/")

    cx, cy, qx, qy, tx, ty = task.hpob.sample_test_set(
        n_context=task.n_context_init, n_query=args.n_query,
        n_target=args.n_target)
    if task.normalize_y:
        all_y = np.concatenate([cy, qy, ty], axis=1)
        all_y = task.normalise_outcomes(all_y)
        nc, nq = cy.shape[1], qy.shape[1]
        cy, qy, ty = (all_y[:, :nc], all_y[:, nc:nc + nq],
                      all_y[:, nc + nq:])
    x = jnp.asarray(np.concatenate([cx, qx], axis=1))
    yv = jnp.asarray(np.concatenate([cy, qy], axis=1))
    batch = task._pack_batch(x, yv, jnp.asarray(tx), jnp.asarray(ty),
                             jnp.zeros((x.shape[0], 0, 1)), None)

    n_ctx0 = int(np.asarray(batch.ctx_mask[0]).sum())
    batch = init_ctx_idx(batch, min(n_ctx0 + args.T, batch.n_points))
    y_t = batch.target_all[..., 0]

    fwd = jax.jit(lambda p, b: model.apply(p, b, training=False))

    b = batch
    var_ranks, std_ratios, lls = [], [], []
    for t in range(args.T):
        out = fwd(params, b)
        po = out.posterior_out
        lls.append(float(gmm_log_prob(y_t, po.mixture_means,
                                      po.mixture_stds,
                                      po.mixture_weights).mean()))
        pq = out.posterior_out_query
        var = gmm_variance(pq.mixture_means, pq.mixture_stds,
                           pq.mixture_weights)                    # [B, P]
        pool = b.query_mask
        var_m = jnp.where(pool, var, -jnp.inf)
        idx = out.design_out.idx                                  # [B]
        chosen_var = jnp.take_along_axis(var_m, idx[:, None],
                                         axis=-1)[:, 0]
        # rank = number of pool points with strictly larger variance
        rank = jnp.sum(var_m > chosen_var[:, None], axis=-1)
        pool_max = jnp.max(var_m, axis=-1)
        # std ratio on the UNMASKED variance: if the policy ever picks an
        # already-acquired (non-pool) point, the masked value is -inf and
        # would silently poison the mean with NaN
        chosen_var_raw = jnp.take_along_axis(var, idx[:, None],
                                             axis=-1)[:, 0]
        ratio = jnp.sqrt(chosen_var_raw / pool_max)
        pool_sz = jnp.sum(pool, axis=-1)
        var_ranks.append(np.asarray(rank / jnp.maximum(pool_sz - 1, 1)))
        std_ratios.append(np.asarray(ratio))
        b, _, _ = select_design(b, idx)

    out = fwd(params, b)
    po = out.posterior_out
    lls.append(float(gmm_log_prob(y_t, po.mixture_means, po.mixture_stds,
                                  po.mixture_weights).mean()))

    var_ranks = np.stack(var_ranks)        # [T, B] normalized 0..1
    std_ratios = np.stack(std_ratios)      # [T, B]
    match = (var_ranks == 0.0).mean()

    name = os.path.basename(os.path.normpath(args.run_dir))
    print(f"== {name}: policy acquisition vs the variance ordering ==")
    print(f"  top-variance match rate: {match:.1%} "
          f"(uncertainty sampling = 100%, random = ~1%)")
    print(f"  mean normalized variance-rank of chosen point: "
          f"{var_ranks.mean():.3f} (0 = top variance, random = ~0.5)")
    print(f"  mean chosen-std / pool-max-std: {std_ratios.mean():.3f}")
    print(f"  per-step mean rank (t=0,5,10,15,20,25,29): "
          f"{np.array2string(var_ranks.mean(1)[::5], precision=3)}")
    print(f"  targeted LL: start {lls[0]:+.3f} final {lls[-1]:+.3f}")

    out_path = args.out or os.path.join(
        "benchmarks", "artifacts", f"hpo_acq_diag_{name}.npz")
    np.savez(out_path, var_ranks=var_ranks, std_ratios=std_ratios,
             ll=np.array(lls))
    print("saved", out_path)


if __name__ == "__main__":
    main()
