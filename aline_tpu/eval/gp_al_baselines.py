"""Classical Gaussian-process active-learning baselines.

Capability parity with the reference baseline suite
(reference: utils/gp_active_learning.py:11-255, 573-874): an exact GP
regressor with ML-II hyperparameter fitting plus the acquisition functions
{uncertainty sampling, GP-UCB, variance reduction, EPIG, BALD, random} and
an active-learning driver that re-fits per step.

TPU-first redesign: the reference re-fits a scikit-learn GP per step per
batch element on the host CPU (its hot loop).  Here the regressor is a
fixed-iteration Adam ML-II optimization of (log lengthscale, log amplitude,
log noise) on the exact marginal likelihood — pure jnp, vmapped over the
experiment batch and scanned over AL steps, so the entire baseline sweep is
one compiled program.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from aline_tpu.distributions.gmm import normal_log_prob

ACQUISITION_FUNCTIONS = ("uncertainty", "ucb", "variance_reduction",
                         "epig", "bald", "random")


class GPParams(NamedTuple):
    log_ls: jnp.ndarray       # [D]
    log_amp: jnp.ndarray      # []
    log_noise: jnp.ndarray    # []


def _rbf(x1, x2, params: GPParams):
    ls = jnp.exp(params.log_ls)
    d = (x1[:, None, :] - x2[None, :, :]) / ls
    return jnp.exp(params.log_amp) * jnp.exp(-0.5 * jnp.sum(d * d, -1))


def _neg_mll(params: GPParams, X, y, mask):
    """Negative log marginal likelihood with a validity mask over rows
    (masked-out rows become iid unit-noise pseudo-observations that do not
    influence the fit)."""
    n = X.shape[0]
    K = _rbf(X, X, params)
    noise = jnp.exp(params.log_noise) + 1e-6
    m = mask.astype(X.dtype)
    # deactivate invalid rows: zero cross-covariance, unit diagonal
    K = K * m[:, None] * m[None, :]
    K = K + jnp.diag(jnp.where(mask, noise, 1.0))
    L = jnp.linalg.cholesky(K + 1e-6 * jnp.eye(n))
    yv = jnp.where(mask, y, 0.0)
    alpha = jax.scipy.linalg.cho_solve((L, True), yv)
    return (0.5 * yv @ alpha + jnp.sum(jnp.log(jnp.diag(L)) * m)
            + 0.5 * jnp.sum(m) * math.log(2 * math.pi))


def fit_gp(X, y, mask, n_steps: int = 80, lr: float = 0.1) -> GPParams:
    """ML-II fit by Adam on the exact marginal likelihood
    (the reference delegates to sklearn's L-BFGS restarts,
    utils/gp_active_learning.py:573-791)."""
    D = X.shape[-1]
    params = GPParams(jnp.zeros(D), jnp.zeros(()), jnp.log(jnp.asarray(0.1)))
    grad_fn = jax.grad(lambda p: _neg_mll(p, X, y, mask))
    b1, b2, eps = 0.9, 0.999, 1e-8

    def adam_step(carry, i):
        p, m, v = carry
        g = grad_fn(p)
        m = jax.tree_util.tree_map(lambda a, b: b1 * a + (1 - b1) * b, m, g)
        v = jax.tree_util.tree_map(lambda a, b: b2 * a + (1 - b2) * b * b,
                                   v, g)
        t = i + 1.0
        def upd(pp, mm, vv):
            mh = mm / (1 - b1 ** t)
            vh = vv / (1 - b2 ** t)
            return pp - lr * mh / (jnp.sqrt(vh) + eps)
        p = jax.tree_util.tree_map(upd, p, m, v)
        return (p, m, v), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    (params, _, _), _ = jax.lax.scan(
        adam_step, (params, zeros, zeros),
        jnp.arange(n_steps, dtype=jnp.float32))
    return params


def gp_posterior(params: GPParams, X, y, mask, Xs
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Posterior mean/variance at Xs, plus the noise variance."""
    n = X.shape[0]
    noise = jnp.exp(params.log_noise) + 1e-6
    m = mask.astype(X.dtype)
    K = _rbf(X, X, params) * m[:, None] * m[None, :]
    K = K + jnp.diag(jnp.where(mask, noise, 1.0)) + 1e-6 * jnp.eye(n)
    L = jnp.linalg.cholesky(K)
    Ks = _rbf(Xs, X, params) * m[None, :]                    # [M, n]
    alpha = jax.scipy.linalg.cho_solve((L, True),
                                       jnp.where(mask, y, 0.0))
    mean = Ks @ alpha
    v = jax.scipy.linalg.solve_triangular(L, Ks.T, lower=True)
    var = jnp.exp(params.log_amp) - jnp.sum(v * v, axis=0)
    return mean, jnp.maximum(var, 1e-10), noise


def _posterior_cov(params: GPParams, X, mask, A, B):
    """Posterior cross-covariance cov(f(A), f(B) | X)."""
    n = X.shape[0]
    noise = jnp.exp(params.log_noise) + 1e-6
    m = mask.astype(X.dtype)
    K = _rbf(X, X, params) * m[:, None] * m[None, :]
    K = K + jnp.diag(jnp.where(mask, noise, 1.0)) + 1e-6 * jnp.eye(n)
    L = jnp.linalg.cholesky(K)
    Ka = _rbf(A, X, params) * m[None, :]
    Kb = _rbf(B, X, params) * m[None, :]
    va = jax.scipy.linalg.solve_triangular(L, Ka.T, lower=True)
    vb = jax.scipy.linalg.solve_triangular(L, Kb.T, lower=True)
    return _rbf(A, B, params) - va.T @ vb


# ---------------------------------------------------------------------------
# Acquisition scores (higher = better), one call per batch element
# ---------------------------------------------------------------------------

def acq_uncertainty(params, X, y, mask, Xq, Xt, key):
    """Maximum posterior variance (reference :11-27)."""
    _, var, _ = gp_posterior(params, X, y, mask, Xq)
    return var


def acq_ucb(params, X, y, mask, Xq, Xt, key, beta: float = 2.0):
    """GP-UCB (reference :30-56)."""
    mean, var, _ = gp_posterior(params, X, y, mask, Xq)
    return mean + beta * jnp.sqrt(var)


def acq_variance_reduction(params, X, y, mask, Xq, Xt, key):
    """Expected total variance reduction at the targets
    (reference :59-122): adding candidate c reduces var(f_t) by
    cov(f_t, f_c)^2 / (var(f_c) + noise)."""
    _, var_q, noise = gp_posterior(params, X, y, mask, Xq)
    cov_tq = _posterior_cov(params, X, mask, Xt, Xq)         # [Nt, Nq]
    return jnp.sum(cov_tq ** 2, axis=0) / (var_q + noise)


def acq_epig(params, X, y, mask, Xq, Xt, key):
    """Expected predictive information gain at the targets
    (reference :125-213): sum_t I(y_c; f_t) = -0.5 sum_t log(1 - rho^2)."""
    _, var_q, noise = gp_posterior(params, X, y, mask, Xq)
    _, var_t, _ = gp_posterior(params, X, y, mask, Xt)
    cov_tq = _posterior_cov(params, X, mask, Xt, Xq)
    rho2 = cov_tq ** 2 / ((var_q + noise)[None, :] * var_t[:, None])
    rho2 = jnp.clip(rho2, 0.0, 1.0 - 1e-6)
    return -0.5 * jnp.sum(jnp.log1p(-rho2), axis=0)


def acq_bald(params, X, y, mask, Xq, Xt, key):
    """BALD for GP regression (reference :216-237):
    0.5 log(1 + var_f / noise)."""
    _, var, noise = gp_posterior(params, X, y, mask, Xq)
    return 0.5 * jnp.log1p(var / noise)


def acq_random(params, X, y, mask, Xq, Xt, key):
    """Random scores (reference :240-255)."""
    return jax.random.uniform(key, (Xq.shape[0],))


_ACQ = {"uncertainty": acq_uncertainty, "ucb": acq_ucb,
        "variance_reduction": acq_variance_reduction, "epig": acq_epig,
        "bald": acq_bald, "random": acq_random}


# ---------------------------------------------------------------------------
# Active-learning driver
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("acquisition", "T", "fit_steps", "n_ctx_init"))
def active_learning_with_gp(x, y, target_x, target_y, n_ctx_init: int,
                            T: int, key: jax.Array,
                            acquisition: str = "uncertainty",
                            fit_steps: int = 80) -> Dict[str, jnp.ndarray]:
    """Run T AL steps of the classical GP baseline on a batch of problems
    (reference driver: utils/gp_active_learning.py:573-791).

    Args:
        x/y:          [B, P, D] / [B, P, 1] candidate pool (first
                      ``n_ctx_init`` are the initial context).
        target_x/y:   [B, Nt, D] / [B, Nt, 1] held-out evaluation points.

    Returns dict with per-step curves:
        rmse [B, T+1], log_prob [B, T+1] (predictive Gaussian at targets,
        evaluated BEFORE each acquisition, plus once after the last).
    """
    B, P, D = x.shape
    acq_fn = _ACQ[acquisition]

    def one_problem(xb, yb, txb, tyb, kb):
        ctx_mask0 = jnp.zeros(P, bool).at[:n_ctx_init].set(True)

        def metrics(mask):
            params = fit_gp(xb, yb[:, 0], mask, n_steps=fit_steps)
            mean, var, noise = gp_posterior(params, xb, yb[:, 0], mask, txb)
            rmse = jnp.sqrt(jnp.mean((mean - tyb[:, 0]) ** 2))
            lp = jnp.mean(normal_log_prob(tyb[:, 0], mean,
                                          jnp.sqrt(var + noise)))
            return params, rmse, lp

        def step(carry, t):
            mask, k = carry
            k, k_acq = jax.random.split(k)
            params, rmse, lp = metrics(mask)
            scores = acq_fn(params, xb, yb[:, 0], mask, xb, txb, k_acq)
            scores = jnp.where(mask, -jnp.inf, scores)       # pool only
            idx = jnp.argmax(scores)
            return (mask.at[idx].set(True), k), (rmse, lp)

        (mask, _), (rmses, lps) = jax.lax.scan(
            step, (ctx_mask0, kb), jnp.arange(T))
        _, rmse_f, lp_f = metrics(mask)
        return (jnp.concatenate([rmses, rmse_f[None]]),
                jnp.concatenate([lps, lp_f[None]]))

    keys = jax.random.split(key, B)
    rmse, lp = jax.vmap(one_problem)(x, y, target_x, target_y, keys)
    return {"rmse": rmse, "log_prob": lp}


def compare_acquisition_methods(x, y, target_x, target_y, n_ctx_init: int,
                                T: int, key: jax.Array,
                                methods=ACQUISITION_FUNCTIONS,
                                fit_steps: int = 80):
    """Run every acquisition method on the same problems
    (reference: utils/gp_active_learning.py:794-874)."""
    return {m: active_learning_with_gp(
        x, y, target_x, target_y, n_ctx_init, T, key, acquisition=m,
        fit_steps=fit_steps) for m in methods}
