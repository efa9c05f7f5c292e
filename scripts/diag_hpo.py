#!/usr/bin/env python
"""Diagnose the HPO-B posterior-calibration defect (round-2 VERDICT #2).

Round-2 finding: on the fixed-BO-init test protocol the ALINE policy has
the BEST posterior RMSE but the WORST targeted log-likelihood of the
three strategies (policy -0.654 < random -0.520).  Hypothesis: the GMM
head's mixture stds are overconfident on the held-out (OOD) datasets the
policy's acquisition pattern produces.

This script separates the possible causes:

1. train-distribution check — policy vs random on random splits of the
   TRAIN datasets (the distribution the model was trained on).  If the
   policy wins there, the defect is OOD-specific, not an acquisition
   pathology.
2. per-step predictive-std + |z|-score traces on the test protocol for
   policy vs random — direct overconfidence evidence ( |z| >> 1 with
   small stds ⇒ overconfident).
3. post-hoc std-floor sensitivity — recompute the targeted LL with the
   mixture component stds clamped to floors; if a modest floor lifts the
   policy above random, miscalibrated stds are confirmed as the whole
   story (means are fine).

Usage: JAX_PLATFORMS=cpu python scripts/diag_hpo.py outputs/hpo_r2_bf16
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--file-name", default="aline_hpo")
    ap.add_argument("--T", type=int, default=30)
    ap.add_argument("--n-query", type=int, default=100)
    ap.add_argument("--n-target", type=int, default=100)
    ap.add_argument("--train-batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aline_tpu.distributions.gmm import (gmm_log_prob, gmm_mean,
                                             gmm_variance)
    from aline_tpu.ops.roles import NEG_INF
    from aline_tpu.tasks import build_task
    from aline_tpu.tasks.base import init_ctx_idx, select_design
    from aline_tpu.utils.serialization import load_config_and_model

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    task = build_task(cfg.task)

    FLOORS = [0.0, 0.005, 0.01, 0.02, 0.05, 0.1]

    def rollout_diag(batch, T, key, strategy):
        """Python rollout capturing per-step posterior params on targets."""
        n_ctx0 = int(np.asarray(batch.ctx_mask[0]).sum())
        batch = init_ctx_idx(batch, min(n_ctx0 + T, batch.n_points))
        y = batch.target_all[..., 0]                     # [B, n_t]
        recs = []
        b = batch
        fwd = jax.jit(lambda p, b: model.apply(p, b, training=False))
        for t in range(T + 1):
            out = fwd(params, b)
            po = out.posterior_out
            ll = gmm_log_prob(y, po.mixture_means, po.mixture_stds,
                              po.mixture_weights)        # [B, n_t]
            pred_mean = gmm_mean(po.mixture_means, po.mixture_weights)
            pred_std = jnp.sqrt(gmm_variance(po.mixture_means,
                                             po.mixture_stds,
                                             po.mixture_weights))
            z = (y - pred_mean) / pred_std
            ll_floor = {f: gmm_log_prob(y, po.mixture_means,
                                        jnp.maximum(po.mixture_stds, f),
                                        po.mixture_weights).mean()
                        for f in FLOORS}
            recs.append(dict(ll=ll.mean(), std=pred_std.mean(),
                             med_std=jnp.median(pred_std),
                             abs_z=jnp.abs(z).mean(),
                             z2=(z ** 2).mean(),
                             rmse=jnp.sqrt(((y - pred_mean) ** 2).mean()),
                             ll_floor=ll_floor))
            if t == T:
                break
            key, k = jax.random.split(key)
            if strategy == "aline":
                idx = out.design_out.idx
            else:
                logits = jnp.where(b.query_mask, 0.0, NEG_INF)
                idx = jax.random.categorical(k, logits, axis=-1)
            b, _, _ = select_design(b, idx)
        return recs

    def summarize(tag, recs):
        f = recs[-1]
        print(f"  {tag}: final LL {float(f['ll']):+.4f}  "
              f"RMSE {float(f['rmse']):.4f}  "
              f"mean pred-std {float(f['std']):.4f} "
              f"(median {float(f['med_std']):.4f})  "
              f"mean|z| {float(f['abs_z']):.2f}  mean z^2 "
              f"{float(f['z2']):.2f}")
        return f

    key = jax.random.key(args.seed)

    # ---- 1. train-distribution check -----------------------------------
    print("== train-distribution (random splits of TRAIN datasets) ==")
    rng = np.random.default_rng(args.seed)
    tb = task.sample_batch(rng, args.train_batch, args.n_query)
    train_final = {}
    for s in ("aline", "random"):
        recs = rollout_diag(tb, args.T, key, s)
        train_final[s] = summarize(s, recs)

    # ---- 2./3. test protocol with std diagnostics ----------------------
    print("== test protocol (fixed BO inits, held-out datasets) ==")
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

    results = {}
    test_recs = {}
    for s in ("aline", "random"):
        recs = rollout_diag(batch, args.T, key, s)
        test_recs[s] = recs
        summarize(s, recs)
        results[f"{s}_ll"] = np.array([float(r["ll"]) for r in recs])
        results[f"{s}_std"] = np.array([float(r["std"]) for r in recs])
        results[f"{s}_absz"] = np.array([float(r["abs_z"]) for r in recs])
        results[f"{s}_rmse"] = np.array([float(r["rmse"]) for r in recs])
        for fl in FLOORS:
            results[f"{s}_ll_floor_{fl}"] = np.array(
                [float(r["ll_floor"][fl]) for r in recs])

    print("== std-floor sensitivity (final-step targeted LL) ==")
    print(f"  {'floor':>6} {'policy':>9} {'random':>9}")
    for fl in FLOORS:
        pa = float(test_recs["aline"][-1]["ll_floor"][fl])
        pr = float(test_recs["random"][-1]["ll_floor"][fl])
        mark = "  <-- policy wins" if pa > pr else ""
        print(f"  {fl:>6} {pa:>+9.4f} {pr:>+9.4f}{mark}")

    out = os.path.join(args.run_dir, "eval", "hpo_calibration_diag.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **results)
    print("saved", out)


if __name__ == "__main__":
    main()
