#!/usr/bin/env python
"""Diagnose a trained continuous-design policy: per-step design mean/std
statistics and NLL trajectory from a greedy rollout (CPU-friendly).

Usage: python scripts/diag_continuous.py OUTPUT_DIR [OUTPUT_DIR ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ALINE_PLATFORM", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from aline_tpu.models import build_model
from aline_tpu.tasks import build_task
from aline_tpu.train.checkpoint import load_checkpoint
from aline_tpu.train.continuous import make_continuous_batch
from aline_tpu.utils.serialization import load_config


def diag(out_dir: str, batch_size: int = 64) -> None:
    cfg = load_config(out_dir)
    task = build_task(cfg.task)
    model = build_model(cfg)
    T = cfg.T
    key = jax.random.key(0)
    batch = make_continuous_batch(task, key, batch_size, T)
    template = model.init(key, batch, training=False)
    state, _ = load_checkpoint(os.path.join(out_dir, "model", "aline_cont"),
                               dict(params=template))
    params = state["params"]
    n_ctx0 = task.n_context_init
    x_buf, y_buf, ctx = batch.x, batch.y, batch.ctx_mask
    k = key
    print(f"== {out_dir} (T={T}) ==")
    print(f"{'t':>3} {'|mean|':>8} {'std(mean)':>9} {'policy_std':>10} "
          f"{'nll_q':>8}")
    for t in range(T):
        k, k_d = jax.random.split(k)
        tt = (jnp.float32(t) / T) if cfg.time_token else jnp.zeros(())
        b = batch.replace(x=x_buf, y=y_buf, ctx_mask=ctx, t=tt)
        out = model.apply(params, b, training=False, rng=k_d)
        mean = out.design_out.mean[:, 0]
        std = out.design_out.std[:, 0]
        xi = mean
        k, k_s = jax.random.split(k)
        y = task.simulate(k_s, task.unnormalise_design(xi), batch.theta)
        slot = n_ctx0 + t
        bsel = jnp.arange(batch_size)
        x_buf = x_buf.at[bsel, slot].set(xi)
        y_buf = y_buf.at[bsel, slot].set(y)
        ctx = ctx.at[bsel, slot].set(True)
        from aline_tpu.distributions.gmm import gmm_log_prob
        ll = gmm_log_prob(batch.target_all[..., 0],
                          out.posterior_out.mixture_means,
                          out.posterior_out.mixture_stds,
                          out.posterior_out.mixture_weights)
        if t % 5 == 0 or t == T - 1:
            print(f"{t:>3} {float(jnp.mean(jnp.abs(mean))):>8.3f} "
                  f"{float(jnp.std(mean)):>9.3f} "
                  f"{float(jnp.mean(std)):>10.4f} "
                  f"{float(-jnp.mean(ll)):>8.3f}")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        diag(d)
