#!/usr/bin/env python
"""Train the continuous-design (DAD-style) Gaussian-policy ALINE variant.

The reference ships ``ContinuousEmbedder``/``ContinuousOutputHead``
(reference: model/embedder.py:218-301, model/head.py:396-495) but never
wires them into its training entry point (SURVEY.md §7 quirk list).
This framework wires them (aline_tpu/train/continuous.py); this script
trains the wired path on a BED task and evaluates final sPCE/sNMC
bounds from greedy continuous rollouts, for comparison against the
discrete-pool policy (round-3 VERDICT #10).

Usage (location finding, a few k epochs):
    python scripts/train_continuous.py max_epoch=5000 burning_epoch=1000 \
        output_dir=outputs/loc_continuous
Extra overrides are standard config overrides; task defaults to the
canonical location-finding recipe.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULTS = [
    "task=location_finding", "task.theta_dist=uniform",
    "task.n_target_theta=2", "task.K=1", "task.n_query_init=1",
    "lr=1e-3", "gamma=1", "min_T=30", "T=30", "batch_size=200",
    "max_epoch=5000", "burning_epoch=1000", "verbose=250",
    "embedder.continuous=true", "head.continuous=true",
    "output_dir=outputs/loc_continuous", "file_name=aline_cont.pth",
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
    from aline_tpu.models import build_model
    from aline_tpu.tasks import build_task
    from aline_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from aline_tpu.train.continuous import (make_continuous_batch,
                                            rollout_continuous)
    from aline_tpu.train.loss import total_loss
    from aline_tpu.train.optimizer import build_optimizer, phase_for_epoch
    from aline_tpu.train.rollout import RolloutOutputs
    from aline_tpu.utils.serialization import save_config
    from aline_tpu.utils.tracking import RunTracker

    cfg = parse_overrides(DEFAULTS + argv)
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_config(cfg, cfg.output_dir)
    print(f"devices: {jax.devices()}", flush=True)
    print(to_yaml(cfg), flush=True)

    task = build_task(cfg.task)
    model = build_model(cfg)
    T = cfg.T
    key = jax.random.key(cfg.seed)
    init_batch = make_continuous_batch(task, key, 2, T)
    params = model.init(key, init_batch, training=False)

    n_t = task.n_target_theta
    w = jnp.full((n_t,), 1.0 / n_t, jnp.float32)

    def make_step(tx):
        def step(params, opt_state, key, alpha, design_on):
            k_batch, k_roll, k_contr, k_next = jax.random.split(key, 4)
            batch = make_continuous_batch(task, k_batch, cfg.batch_size, T)

            def loss_fn(p):
                ro = rollout_continuous(
                    model, p, task, batch, T, w, w, k_roll, training=True,
                    time_token=cfg.time_token,
                    use_remat=cfg.rollout_remat)
                ro_std = RolloutOutputs(ro.log_probs, ro.nll_query,
                                        ro.nll_pred, None, ro.xs, ro.ys,
                                        None)
                loss, m = total_loss(ro_std, cfg.gamma, alpha)
                m = dict(m, policy_std=jnp.mean(ro.stds))
                if cfg.alpha_pce > 0:
                    # DAD-style pathwise sPCE: the rollout is fully
                    # reparameterized (design sampling + simulator), so the
                    # PCE loss differentiates end-to-end through the scan.
                    xs_bt = task.to_design_space(
                        jnp.swapaxes(ro.xs, 0, 1))           # [B, T, D]
                    ys_bt = jnp.swapaxes(ro.ys, 0, 1)        # [B, T, 1]
                    contr = task.sample_theta(
                        k_contr, (cfg.pce_L, cfg.batch_size))
                    thetas = jnp.concatenate(
                        [batch.theta[None], contr], axis=0)
                    l_pce = pce_loss(task, ys_bt, xs_bt, thetas)
                    # design_on gates design training (0 in burning phase),
                    # independently of the REINFORCE weight alpha
                    loss = loss + design_on * cfg.alpha_pce * l_pce
                    m = dict(m, loss=loss, pce_loss=l_pce,
                             spce_train=jnp.log(cfg.pce_L + 1.0) - l_pce)
                return loss, m

            (loss, m), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, k_next, m

        return jax.jit(step, donate_argnums=(0, 1))

    ckpt_path = os.path.join(cfg.output_dir, "ckpt_cont")
    start_epoch = 0
    tx = opt_state = None
    if cfg.load_path:
        # warm-start params only (fresh optimizer/schedule/epoch count)
        # from a saved model checkpoint, e.g. a previous run's final
        # model/aline_cont
        state, _ = load_checkpoint(cfg.load_path, dict(params=params))
        params = state["params"]
        print(f"warm-started params from {cfg.load_path}", flush=True)
    elif cfg.load_checkpoint and os.path.exists(
            os.path.join(ckpt_path, "tree")):
        # peek the host-side epoch to know which phase's optimizer
        # structure the checkpoint holds (burning vs main differ)
        import pickle
        host_pkl = os.path.join(ckpt_path, "host_state.pkl")
        saved_epoch = 0
        if os.path.exists(host_pkl):
            with open(host_pkl, "rb") as f:
                saved_epoch = int(pickle.load(f)["epoch"])
        ph0 = phase_for_epoch(cfg, saved_epoch)
        tx0, _ = build_optimizer(cfg, params, ph0)
        template = dict(params=params, key=jax.random.key_data(key),
                        opt_state=tx0.init(params))
        try:
            state, host = load_checkpoint(ckpt_path, template)
            tx, opt_state = tx0, state["opt_state"]
        except Exception:
            # older checkpoints lack opt_state — params+key only, the
            # optimizer restarts (Adam moments lost)
            state, host = load_checkpoint(
                ckpt_path, dict(params=params,
                                key=jax.random.key_data(key)))
        params = state["params"]
        key = jax.random.wrap_key_data(state["key"])
        start_epoch = int(host["epoch"]) if host else 0
        print(f"resumed from {ckpt_path} at epoch {start_epoch}"
              f" (opt_state {'restored' if tx else 'reset'})", flush=True)

    tracker = RunTracker(cfg.output_dir)
    phase = phase_for_epoch(cfg, start_epoch) if tx else None
    step_fn = make_step(tx) if tx else None
    t0 = time.perf_counter()
    m = {}
    for epoch in range(start_epoch, cfg.max_epoch):
        ph = phase_for_epoch(cfg, epoch)
        if ph != phase:
            phase = ph
            tx, _ = build_optimizer(cfg, params, phase)
            opt_state = tx.init(params)
            step_fn = make_step(tx)
            print(f"epoch {epoch}: phase -> {phase}", flush=True)
        alpha = jnp.asarray(0.0 if phase == "burning" else cfg.alpha,
                            jnp.float32)
        design_on = jnp.asarray(0.0 if phase == "burning" else 1.0,
                                jnp.float32)
        params, opt_state, key, m = step_fn(params, opt_state, key, alpha,
                                            design_on)
        if cfg.verbose and (epoch + 1) % cfg.verbose == 0:
            rate = (epoch + 1 - start_epoch) / (time.perf_counter() - t0)
            print(f"epoch {epoch + 1}: loss {float(m['loss']):.4f} "
                  f"LL {float(m['likelihood']):.4f} "
                  f"design {float(m['design_loss']):.4f} "
                  f"std {float(m['policy_std']):.4f} "
                  f"({rate:.1f} ep/s)", flush=True)
            tracker.log({k: float(v) for k, v in m.items()}, epoch + 1)
        if cfg.checkpoint and (epoch + 1) % cfg.checkpoint == 0:
            save_checkpoint(
                ckpt_path,
                dict(params=params, key=jax.random.key_data(key),
                     opt_state=opt_state),
                dict(epoch=epoch + 1))

    final = os.path.join(cfg.output_dir, "model",
                         cfg.file_name.split(".")[0])
    save_checkpoint(final, dict(params=params))
    tracker.finish()
    print(f"saved {final}", flush=True)

    # ---- final sPCE/sNMC from greedy continuous rollouts ---------------
    if cfg.eval.EIG:
        from aline_tpu.eval.eig import eval_eig_from_history

        M, bs = cfg.eval.M_final, cfg.eval.batch_size_final
        T_f = cfg.eval.T_final
        n_ctx0 = task.n_context_init
        thetas, xs, ys = [], [], []

        @jax.jit
        def greedy(k, kr):
            b = make_continuous_batch(task, k, bs, T_f)
            ro = rollout_continuous(model, params, task, b, T_f, w, w, kr,
                                    training=False,
                                    time_token=cfg.time_token,
                                    use_remat=False)
            x = jnp.concatenate([b.x[:, :n_ctx0],
                                 jnp.swapaxes(ro.xs, 0, 1)], axis=1)
            y = jnp.concatenate([b.y[:, :n_ctx0],
                                 jnp.swapaxes(ro.ys, 0, 1)], axis=1)
            return b.theta, task.unnormalise_design(x), y

        for i in range((M + bs - 1) // bs):
            key, k_b, k_r = jax.random.split(key, 3)
            th, x, y = greedy(k_b, k_r)
            thetas.append(th)
            xs.append(np.asarray(x))
            ys.append(np.asarray(y))
        theta_0 = jax.tree_util.tree_map(
            lambda *a: np.concatenate([np.asarray(x) for x in a], 0),
            *thetas)
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
        np.savez(os.path.join(cfg.output_dir, "continuous_bounds.npz"),
                 pce_mean=bounds["pce_mean"], pce_err=bounds["pce_err"],
                 nmc_mean=bounds["nmc_mean"], nmc_err=bounds["nmc_err"],
                 L=cfg.eval.L_final, M=M, T=T_f)


if __name__ == "__main__":
    main()
