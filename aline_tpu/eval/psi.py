"""QUEST+/PSI grid-Bayes psychometric baseline (native implementation).

The reference compares its psychometric policy against *precomputed*
QuestPlus/PSI result files (reference: notebooks/eval_psychometric.ipynb
cell 3, loading ``results/*.npy``) that are absent from its snapshot, so
the method itself never appears in the reference code.  This module is a
from-scratch, TPU-idiomatic implementation of the underlying algorithm —
the psi method of Kontsevich & Tyler (1999) generalized to arbitrary
target-parameter subsets as in QUEST+ (Watson 2017):

* a product grid over theta = (alpha, beta, gamma, lambda) carries the
  exact discrete posterior; the Bernoulli likelihood updates it with one
  gathered log-likelihood column per trial;
* the next stimulus maximizes the mutual information I(y; theta_S) between
  the outcome and the *targeted subset* S of parameters (S = the ALINE
  target mask, e.g. {alpha, beta}), marginalizing the nuisance parameters;
* by the MI identity, I(y; theta_S) = H_b(p(y)) - E_{theta_S}[H_b(p(y |
  theta_S))], which needs only [G]x[G,N]-shaped contractions per step —
  MXU matmuls — instead of materializing per-candidate posteriors
  ([B, G, N] entropy tensors);
* everything is ``vmap``-ed over subjects and ``lax.scan``-ned over
  trials; candidate designs are the *same pre-simulated pool* the ALINE
  policy draws from (:class:`aline_tpu.tasks.base.Batch`), with consumed-
  point masking, so design quality is compared on identical randomness.

Reported metrics mirror :func:`aline_tpu.eval.al_curves.al_rollout_curves`:
the mask-weighted log posterior density of the true parameters (grid
marginals are piecewise-constant densities; the ALINE GMM head is likewise
factorized per parameter) and the mask-weighted RMSE of the posterior
mean.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aline_tpu.ops.roles import NEG_INF
from aline_tpu.tasks.base import Batch

_EPS = 1e-10  # Bernoulli clip, matching PsychometricTask.log_likelihood


def make_theta_grid(task, n_axis: Sequence[int] = (33, 17, 9, 7)):
    """Cell-centered product grid over the task's uniform prior box.

    Returns dict with ``axes`` (4 arrays), ``widths`` [4], ``shape``,
    ``theta`` [G, 4] (flattened meshgrid, C order), ``ranges``.
    """
    ranges = (task.ALPHA_RANGE, task.BETA_RANGE, task.GAMMA_RANGE,
              task.LAMBDA_RANGE)
    axes, widths = [], []
    for (lo, hi), n in zip(ranges, n_axis):
        w = (hi - lo) / n
        axes.append(jnp.linspace(lo + w / 2, hi - w / 2, n))
        widths.append(w)
    mesh = jnp.meshgrid(*axes, indexing="ij")
    theta = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)   # [G, 4]
    return {"axes": axes, "widths": jnp.asarray(widths),
            "shape": tuple(int(n) for n in n_axis), "theta": theta,
            "ranges": ranges}


def _binary_entropy(p: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -(p * jnp.log(p) + (1.0 - p) * jnp.log1p(-p))


def _metrics(log_post: jnp.ndarray, grid, theta_true: jnp.ndarray,
             mask_w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask-weighted log density at theta_true and posterior-mean RMSE.

    log_post: [G] unnormalized; theta_true: [4]; mask_w: [4] normalized.
    """
    shape = grid["shape"]
    lp = log_post.reshape(shape)
    lp = lp - jax.scipy.special.logsumexp(lp)                 # normalized
    lls, sqes = [], []
    for d in range(4):
        other = tuple(i for i in range(4) if i != d)
        log_marg = jax.scipy.special.logsumexp(lp, axis=other)  # [n_d]
        axis = grid["axes"][d]
        w = grid["widths"][d]
        lo = grid["ranges"][d][0]
        mean_d = jnp.sum(jnp.exp(log_marg) * axis)
        cell = jnp.clip(jnp.floor((theta_true[d] - lo) / w).astype(jnp.int32),
                        0, axis.shape[0] - 1)
        lls.append(log_marg[cell] - jnp.log(w))               # log density
        sqes.append((theta_true[d] - mean_d) ** 2)
    ll = jnp.sum(jnp.stack(lls) * mask_w)
    rmse = jnp.sqrt(jnp.sum(jnp.stack(sqes) * mask_w))
    return ll, rmse


def info_gain(post: jnp.ndarray, P: jnp.ndarray, HbP: jnp.ndarray,
              grid, subset: Tuple[int, ...],
              P_sub: jnp.ndarray = None) -> jnp.ndarray:
    """I(y; theta_S) per candidate design.

    post: [G]; P/HbP: [G, N]; for a strict subset S, ``P_sub`` is the
    pre-permuted [GS, GN, N] view of P (hoisted out of the trial loop —
    it is constant across trials).
    """
    p1 = post @ P                                             # [N]
    h_marginal = _binary_entropy(p1)
    if len(subset) == 4:
        return h_marginal - post @ HbP
    shape = grid["shape"]
    nuis = tuple(i for i in range(4) if i not in subset)
    perm = tuple(subset) + nuis
    gs = int(np.prod([shape[i] for i in subset]))
    gn = int(np.prod([shape[i] for i in nuis]))
    if P_sub is None:
        P_sub = P.reshape(shape + (-1,)).transpose(
            perm + (4,)).reshape(gs, gn, -1)
    post_r = post.reshape(shape).transpose(perm).reshape(gs, gn)
    p_s = jnp.sum(post_r, axis=1)                             # [GS]
    # p(y=1 | theta_S, x) = E[p(y=1|theta,x) | theta_S]
    num = jnp.einsum("sg,sgn->sn", post_r, P_sub)             # [GS, N]
    p1_given_s = num / jnp.maximum(p_s[:, None], _EPS)
    return h_marginal - p_s @ _binary_entropy(p1_given_s)


def psi_rollout_curves(task, batch: Batch, T: int, key: jax.Array,
                       mask: np.ndarray, strategy: str = "psi",
                       grid=None, b_chunk: int = 4) -> Dict[str, np.ndarray]:
    """Grid-Bayes rollout on the batch's pre-simulated pool.

    Args:
        batch: a psychometric-task batch (x/y pool + initial context).
        mask: [4] bool target mask — the PSI criterion maximizes
            information about exactly these parameters (QUEST+ marginal
            criterion); metrics are weighted the same way as the ALINE
            eval (normalized mask weights).
        strategy: ``"psi"`` (max marginal info gain) or ``"random"``.

    Returns dict with ``log_prob``/``rmse`` [B, T+1] (step 0 = posterior
    on the initial context only, matching ``al_rollout_curves``) and
    ``idx`` [B, T].
    """
    if strategy not in ("psi", "random"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if grid is None:
        grid = make_theta_grid(task)
    mask = np.asarray(mask, bool)
    subset = tuple(int(i) for i in np.flatnonzero(mask))
    mask_w = jnp.asarray(mask, jnp.float32)
    mask_w = mask_w / jnp.maximum(mask_w.sum(), 1.0)
    theta_g = grid["theta"]                                   # [G, 4]
    shape = grid["shape"]
    need_sub = strategy == "psi" and len(subset) < 4
    nuis = tuple(i for i in range(4) if i not in subset)
    perm = tuple(subset) + nuis
    gs = int(np.prod([shape[i] for i in subset]))
    gn = int(np.prod([shape[i] for i in nuis]))

    def run_one(x, y, ctx0, theta_true, k):
        # x/y: [N, 1]; ctx0: [N] bool (initial context); theta_true: [4]
        p = task.psychometric_function(
            x[None, :, :], theta_g[:, None, :])[..., 0]       # [G, N]
        hbp = _binary_entropy(p)
        p_sub = (p.reshape(shape + (-1,)).transpose(perm + (4,))
                 .reshape(gs, gn, -1) if need_sub else None)
        y_bin = y[:, 0]                                       # [N]
        # condition on the initially revealed context points
        ctxf = ctx0.astype(jnp.float32)
        log_post0 = (jnp.log(p + _EPS) * y_bin
                     + jnp.log1p(-p + _EPS) * (1.0 - y_bin)) @ ctxf  # [G]

        def step(carry, _):
            log_post, consumed, kk = carry
            kk, k_sel = jax.random.split(kk)
            ll_now, rmse_now = _metrics(log_post, grid, theta_true, mask_w)
            if strategy == "psi":
                post = jax.nn.softmax(log_post)
                gain = info_gain(post, p, hbp, grid, subset, P_sub=p_sub)
                idx = jnp.argmax(jnp.where(consumed, NEG_INF, gain))
            else:
                logits = jnp.where(consumed, NEG_INF, 0.0)
                idx = jax.random.categorical(k_sel, logits)
            p_col = p[:, idx]
            upd = jnp.where(y_bin[idx] > 0.5, jnp.log(p_col + _EPS),
                            jnp.log1p(-p_col + _EPS))
            return ((log_post + upd, consumed.at[idx].set(True), kk),
                    (ll_now, rmse_now, idx))

        (log_post_f, _, _), (lls, rmses, idxs) = jax.lax.scan(
            step, (log_post0, ctx0, k), None, length=T)
        ll_f, rmse_f = _metrics(log_post_f, grid, theta_true, mask_w)
        return (jnp.concatenate([lls, ll_f[None]]),
                jnp.concatenate([rmses, rmse_f[None]]),
                idxs.astype(jnp.int32))

    B = batch.batch_size
    theta_true = batch.target_all[..., 0]                     # [B, 4]
    keys = jax.random.split(key, B)
    run = jax.jit(jax.vmap(run_one))
    out_ll, out_rmse, out_idx = [], [], []
    for s in range(0, B, b_chunk):
        e = min(s + b_chunk, B)
        ll, rmse, idx = run(batch.x[s:e], batch.y[s:e],
                            batch.ctx_mask[s:e], theta_true[s:e], keys[s:e])
        out_ll.append(np.asarray(ll))
        out_rmse.append(np.asarray(rmse))
        out_idx.append(np.asarray(idx))
    return {"log_prob": np.concatenate(out_ll),
            "rmse": np.concatenate(out_rmse),
            "idx": np.concatenate(out_idx)}
