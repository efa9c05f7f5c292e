#!/usr/bin/env python
"""Train the DAD baseline (Foster et al. 2021) with the pathwise sPCE
objective.

The reference ships the DAD network (reference: model/mlp.py:48-118) and
its PCE losses (reference: loss/eig.py:55-117) but no training entry
point — DAD policies are evaluated from externally trained weights. Here
the full algorithm runs natively: the T-step trace is one ``lax.scan``
with static shapes, the simulator is reparameterized, so the sPCE lower
bound is maximized by plain pathwise gradients (no REINFORCE).

Usage (location finding, matches scripts/train_continuous.py's task):
    python scripts/train_dad.py max_epoch=20000 output_dir=outputs/dad_loc
The contrastive count during training is ``eval.L`` (default 511 here);
final bounds use eval.L_final/M_final/T_final like train_continuous.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULTS = [
    "task=location_finding", "task.theta_dist=uniform",
    "task.n_target_theta=2", "task.K=1", "task.n_query_init=1",
    "lr=5e-4", "T=30", "batch_size=256", "max_epoch=20000",
    "verbose=500", "checkpoint=2000", "eval.L=511",
    "eval.EIG=true", "eval.L_final=1000000", "eval.M_final=400",
    "eval.batch_size_final=200", "eval.T_final=30",
    "output_dir=outputs/dad_loc", "file_name=dad.pth",
]


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    from aline_tpu.utils.preflight import wait_for_backend
    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from aline_tpu.config import parse_overrides, to_yaml
    from aline_tpu.eval.eig_losses import pce_loss
    from aline_tpu.models.baselines import (SetEquivariantDesignNetwork,
                                            run_trace)
    from aline_tpu.tasks import build_task
    from aline_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from aline_tpu.utils.serialization import save_config
    from aline_tpu.utils.tracking import RunTracker

    cfg = parse_overrides(DEFAULTS + argv)
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_config(cfg, cfg.output_dir)
    print(f"devices: {jax.devices()}", flush=True)
    print(to_yaml(cfg), flush=True)

    task = build_task(cfg.task)
    T, B, L = cfg.T, cfg.batch_size, cfg.eval.L
    model = SetEquivariantDesignNetwork(dim_x=task.dim_x, dim_y=task.dim_y)
    key = jax.random.key(cfg.seed)
    params = model.init(key, jnp.zeros((2, T, task.dim_x)),
                        jnp.zeros((2, T, task.dim_y)),
                        jnp.zeros((2, T), bool))

    sched = optax.cosine_decay_schedule(cfg.lr, cfg.max_epoch)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_trace, k_contr, k_next = jax.random.split(key, 3)

        def loss_fn(p):
            theta0, xs, ys = run_trace(model, p, task, T, B, k_trace,
                                       explore_std=cfg.explore_std)
            contr = task.sample_theta(k_contr, (L, B))
            thetas = jnp.concatenate([theta0[None], contr], axis=0)
            return pce_loss(task, ys, xs, thetas)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # sPCE bound estimate implied by the loss (log(L+1) - loss)
        return params, opt_state, k_next, loss

    ckpt_path = os.path.join(cfg.output_dir, "ckpt_dad")
    start_epoch = 0
    if cfg.load_checkpoint and os.path.exists(
            os.path.join(ckpt_path, "tree")):
        state, host = load_checkpoint(
            ckpt_path, dict(params=params, key=jax.random.key_data(key)))
        params = state["params"]
        key = jax.random.wrap_key_data(state["key"])
        start_epoch = int(host["epoch"]) if host else 0
        print(f"resumed from {ckpt_path} at epoch {start_epoch}", flush=True)

    tracker = RunTracker(cfg.output_dir)
    log_lp1 = float(np.log(L + 1))
    t0 = time.perf_counter()
    for epoch in range(start_epoch, cfg.max_epoch):
        params, opt_state, key, loss = step(params, opt_state, key)
        if cfg.verbose and (epoch + 1) % cfg.verbose == 0:
            rate = (epoch + 1 - start_epoch) / (time.perf_counter() - t0)
            spce = log_lp1 - float(loss)
            print(f"epoch {epoch + 1}: pce_loss {float(loss):.4f} "
                  f"train sPCE(L={L}) {spce:.4f} ({rate:.1f} ep/s)",
                  flush=True)
            tracker.log(dict(loss=float(loss), spce_train=spce), epoch + 1)
        if cfg.checkpoint and (epoch + 1) % cfg.checkpoint == 0:
            save_checkpoint(
                ckpt_path,
                dict(params=params, key=jax.random.key_data(key)),
                dict(epoch=epoch + 1))

    final = os.path.join(cfg.output_dir, "model",
                         cfg.file_name.split(".")[0])
    save_checkpoint(final, dict(params=params))
    tracker.finish()
    print(f"saved {final}", flush=True)

    # ---- final sPCE/sNMC bounds, same protocol as train_continuous.py --
    if cfg.eval.EIG:
        from aline_tpu.eval.eig import eval_eig_from_history

        M, bs = cfg.eval.M_final, cfg.eval.batch_size_final
        T_f = cfg.eval.T_final
        thetas, xs, ys = [], [], []
        trace = jax.jit(lambda k: run_trace(model, params, task, T_f, bs, k))
        for _ in range((M + bs - 1) // bs):
            key, k_t = jax.random.split(key)
            th, x, y = trace(k_t)
            thetas.append(np.asarray(th))
            xs.append(np.asarray(x))
            ys.append(np.asarray(y))
        theta_0 = np.concatenate(thetas, 0)
        x = np.concatenate(xs, 0)
        y = np.concatenate(ys, 0)
        key, k_eig = jax.random.split(key)
        bounds = eval_eig_from_history(
            task, jnp.asarray(theta_0), jnp.asarray(x), jnp.asarray(y),
            cfg.eval.L_final, k_eig, M=M, batch_size=bs,
            stepwise=False, err_type=cfg.eval.err_type,
            L_chunk=cfg.eval.L_chunk)
        print(f"final bounds (L={cfg.eval.L_final:g}, M={M}, T={T_f}): "
              f"sPCE {float(bounds['pce_mean']):.4f} "
              f"± {float(bounds['pce_err']):.4f}, "
              f"sNMC {float(bounds['nmc_mean']):.4f} "
              f"± {float(bounds['nmc_err']):.4f}", flush=True)
        np.savez(os.path.join(cfg.output_dir, "dad_bounds.npz"),
                 pce_mean=bounds["pce_mean"], pce_err=bounds["pce_err"],
                 nmc_mean=bounds["nmc_mean"], nmc_err=bounds["nmc_err"],
                 L=cfg.eval.L_final, M=M, T=T_f)


if __name__ == "__main__":
    main()
