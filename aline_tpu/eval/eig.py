"""Streaming, mesh-sharded sPCE / sNMC expected-information-gain bounds.

The north-star evaluation path (SURVEY.md §3.3).  Capability parity with
the reference stack (reference: loss/eig.py:154-208 ``EIGStepLoss``,
utils/eval.py:42-198), re-architected for TPU scale:

* the reference materializes a dense ``[L+1, M]`` accumulator on one
  device, which caps L by memory (it copes via tiny outer batches,
  ``batch_size_final: 5`` at L=1e7).  Here the L axis is processed in
  fixed-size chunks folded into a running max-shifted logsumexp
  (:mod:`aline_tpu.parallel.collectives`), so L=1e7 streams through
  bounded memory at any outer batch size;
* chunks are sharded across the ``contrastive`` mesh axis with
  ``shard_map`` — each chip folds its share of chunks, and one
  pmax/psum pair combines the accumulators (SURVEY.md §5.8).  Results are
  identical on 1 or N devices because chunk PRNG keys are assigned by
  global chunk index.

Bound definitions (reference: utils/eval.py:77-78):
    sPCE = log(L+1) - [logsumexp_{l=0..L} S_l - S_0]
    sNMC = log(L)   - [logsumexp_{l=1..L} S_l - S_0]
where S_l is the cumulative trajectory log-likelihood under theta_l and
theta_0 is the data-generating latent.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from aline_tpu.parallel.collectives import (
    LogSumExpState,
    lse_init,
    lse_update,
    lse_value,
)


def _seq_cum_loglik(task, x, y, thetas) -> jnp.ndarray:
    """Cumulative sequential log-likelihood for a block of thetas.

    Args:
        x: [B, Th, D] designs (real space); y: [B, Th, 1] outcomes;
        thetas: [Lc, B, ...] latin draws.
    Returns:
        S: [Lc, B, Th] with S[l, b, t] = sum_{s<=t} log p(y_s | x_s, th_l).
    """
    # insert the step axis into theta so task likelihoods broadcast
    # (the reference expands theta to [L, B, T, ...], loss/eig.py:38-40)
    ll = task.log_likelihood(y[None], x[None], jnp.expand_dims(thetas, 2))
    return jnp.cumsum(ll[..., 0], axis=-1)                   # [Lc, B, Th]


def _auto_chunk(L: int, B: int, Th: int, L_chunk: int) -> int:
    """Shrink the chunk so the [Lc, B, Th] blocks stay within ~256 MB."""
    budget_elems = 16 * 1024 * 1024  # x4 bytes x a few live intermediates
    cap = max(256, budget_elems // max(B * Th, 1))
    return int(min(L_chunk, cap, max(L, 1)))


# Work ceiling (elements = Lc * B * Th * chunks) for ONE device execution
# of the chunk scan.  A single XLA program that runs for many minutes gets
# the TPU worker killed ("TPU worker process crashed or restarted", seen
# deterministically at eval.batch_size_final=100 on CES: that call did
# ~15e9 element-steps in one execution vs the proven-safe ~3e9 at batch
# 20).  Splitting the scan into several shorter executions with the LSE
# state carried across calls is bit-identical (same fold order) and keeps
# every program comfortably under the worker's patience.
_MAX_ELEMS_PER_CALL = 3_000_000_000


@partial(jax.jit, static_argnames=("task", "L", "Lc", "n_chunks"))
def _accumulate_chunks(task, x, y, key, L: int, Lc: int, n_chunks: int,
                       i0: jnp.ndarray = 0,
                       state: Optional[LogSumExpState] = None
                       ) -> LogSumExpState:
    """Fold n_chunks chunks of Lc contrastive draws into an LSE state.
    Chunk keys derive from the GLOBAL chunk index (``i0`` offset) →
    device-count and call-split invariant.  ``state`` carries the
    accumulator across split calls (bit-identical to one big scan)."""
    B, Th = x.shape[0], x.shape[1]

    def body(state, i):
        k = jax.random.fold_in(key, i)
        thetas = task.sample_theta(k, (Lc, B))
        S = _seq_cum_loglik(task, x, y, thetas)              # [Lc, B, Th]
        valid = (i * Lc + jnp.arange(Lc)) < L
        S = jnp.where(valid[:, None, None], S, -jnp.inf)
        return lse_update(state, S, axis=0), None

    init = lse_init((B, Th)) if state is None else state
    state, _ = jax.lax.scan(body, init, i0 + jnp.arange(n_chunks))
    return state


@partial(jax.jit, static_argnames=("task", "L", "Lc"))
def _accumulate_given_thetas(task, x, y, thetas, L: int, Lc: int
                             ) -> LogSumExpState:
    """Fold PRE-DRAWN contrastive thetas (padded to [n_chunks, Lc, B, ...])
    into an LSE state.  Used for deterministic-theta evaluation, e.g.
    cross-framework parity against the reference estimator."""
    B, Th = x.shape[0], x.shape[1]

    def body(state, args):
        i, th = args
        S = _seq_cum_loglik(task, x, y, th)                  # [Lc, B, Th]
        valid = (i * Lc + jnp.arange(Lc)) < L
        S = jnp.where(valid[:, None, None], S, -jnp.inf)
        return lse_update(state, S, axis=0), None

    n_chunks = thetas.shape[0]
    state, _ = jax.lax.scan(body, lse_init((B, Th)),
                            (jnp.arange(n_chunks), thetas))
    return state


def compute_eig_from_history(task, theta_0, x, y, L: int, key: jax.Array,
                             L_chunk: int = 32_768, stepwise: bool = False,
                             mesh: Optional[Mesh] = None,
                             axis_name: str = "contrastive",
                             thetas: Optional[jnp.ndarray] = None,
                             L_checkpoints: Optional[list] = None):
    """sPCE/sNMC bounds for a batch of histories.

    Args:
        theta_0: [B, ...] data-generating latents (reference prepends them
                 to the contrastive set, utils/eval.py:61-62 — here they
                 are folded in exactly via logaddexp).
        x: [B, Th, D] UNNORMALIZED design history; y: [B, Th, 1] outcomes.
        L: number of contrastive samples.
        mesh: optional mesh whose ``axis_name`` axis shards the chunks.
        stepwise: return [B, Th] per-step bounds instead of final-step [B].
        thetas: optional pre-drawn contrastive latents [L, B, ...] — when
                given, ``L``/``key`` are ignored for sampling and the bound
                is computed on exactly these draws (deterministic-theta
                mode, used for cross-framework parity tests).
        L_checkpoints: optional ascending list of intermediate L values —
                the streaming accumulator is snapshotted as it passes each
                one, so a SINGLE pass yields the whole bracket-vs-L
                convergence curve (bound gap characterization) for the
                price of the largest L. Checkpoints snap up to chunk
                multiples; the returned dict is keyed by the EFFECTIVE
                (snapped) L used in each bound's normalization.
                Single-device path only (no mesh).

    Returns:
        (pce, nmc): EIG bounds, [B, Th] if stepwise else [B]; or, with
        ``L_checkpoints``, an ``{L_eff: (pce, nmc)}`` dict.
    """
    B, Th = x.shape[0], x.shape[1]
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    # exact theta_0 trajectory log-lik (the l=0 term)
    ll0 = task.log_likelihood(y, x, jnp.expand_dims(theta_0, 1))
    S0 = jnp.cumsum(ll0[..., 0], axis=-1)                    # [B, Th]

    if thetas is not None:
        thetas = jnp.asarray(thetas)
        L = int(thetas.shape[0])
        Lc = _auto_chunk(L, B, Th, L_chunk)
        n_chunks = math.ceil(L / Lc)
        pad = n_chunks * Lc - L
        if pad:
            filler = jnp.broadcast_to(thetas[:1],
                                      (pad,) + thetas.shape[1:])
            thetas = jnp.concatenate([thetas, filler], axis=0)
        thetas = thetas.reshape((n_chunks, Lc) + thetas.shape[1:])
        state = _accumulate_given_thetas(task, x, y, thetas, L, Lc)
        return _finalize_bounds(state, S0, L, stepwise)

    Lc = _auto_chunk(L, B, Th, L_chunk)
    n_chunks = math.ceil(L / Lc)

    if mesh is not None and "data" in mesh.shape and axis_name in mesh.shape:
        # 2-D evaluation mesh: B shards over 'data' while chunks shard
        # over the contrastive axis (SURVEY.md §5.8).  Contrastive draws
        # are keyed per (global chunk id, GLOBAL batch index), so results
        # are invariant to the mesh factorization (tested (1,8)/(2,4)/
        # (4,2)/(8,1) in tests/test_eig.py).
        n_data = mesh.shape["data"]
        n_con = mesh.shape[axis_name]
        if B % n_data:
            raise ValueError(f"batch {B} must divide mesh data axis "
                             f"{n_data}")
        n_chunks = math.ceil(n_chunks / n_con) * n_con
        chunk_ids = jnp.arange(n_chunks)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(axis_name), P("data"), P("data"), P()),
                 out_specs=P("data"), check_vma=False)
        def sharded2(chunk_ids_local, x_in, y_in, key_in):
            B_loc = x_in.shape[0]
            b0 = jax.lax.axis_index("data") * B_loc

            def body(state, i):
                k = jax.random.fold_in(key_in, i)
                bkeys = jax.vmap(jax.random.fold_in, (None, 0))(
                    k, b0 + jnp.arange(B_loc))
                thetas = jax.vmap(
                    lambda kk: task.sample_theta(kk, (Lc,)),
                    out_axes=1)(bkeys)                    # [Lc, B_loc, ...]
                S = _seq_cum_loglik(task, x_in, y_in, thetas)
                valid = (i * Lc + jnp.arange(Lc)) < L
                S = jnp.where(valid[:, None, None], S, -jnp.inf)
                return lse_update(state, S, axis=0), None

            local, _ = jax.lax.scan(body, lse_init((B_loc, Th)),
                                    chunk_ids_local)
            gmax = jax.lax.pmax(local.max, axis_name)
            safe = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
            scaled = local.sumexp * jnp.exp(
                jnp.where(jnp.isfinite(local.max), local.max - safe,
                          -jnp.inf))
            total = jax.lax.psum(scaled, axis_name)
            return LogSumExpState(gmax, total)

        state = sharded2(chunk_ids, x, y, key)
        return _finalize_bounds(state, S0, L, stepwise)

    if mesh is not None and mesh.shape[axis_name] > 1:
        n_dev = mesh.shape[axis_name]
        n_chunks = math.ceil(n_chunks / n_dev) * n_dev
        chunk_ids = jnp.arange(n_chunks)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(axis_name), P(), P(), P()),
                 out_specs=P(), check_vma=False)
        def sharded(chunk_ids_local, x_in, y_in, key_in):
            def body(state, i):
                k = jax.random.fold_in(key_in, i)
                thetas = task.sample_theta(k, (Lc, B))
                S = _seq_cum_loglik(task, x_in, y_in, thetas)
                valid = (i * Lc + jnp.arange(Lc)) < L
                S = jnp.where(valid[:, None, None], S, -jnp.inf)
                return lse_update(state, S, axis=0), None

            local, _ = jax.lax.scan(body, lse_init((B, Th)),
                                    chunk_ids_local)
            # max-shifted cross-device combine
            gmax = jax.lax.pmax(local.max, axis_name)
            safe = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
            scaled = local.sumexp * jnp.exp(
                jnp.where(jnp.isfinite(local.max), local.max - safe,
                          -jnp.inf))
            total = jax.lax.psum(scaled, axis_name)
            return LogSumExpState(gmax, total)

        state = sharded(chunk_ids, x, y, key)
    else:
        # split the scan so no single device execution exceeds the work
        # ceiling (see _MAX_ELEMS_PER_CALL); the LSE carry makes the split
        # bit-identical to one big scan
        per_chunk = max(Lc * B * Th, 1)
        group = max(1, min(n_chunks, _MAX_ELEMS_PER_CALL // per_chunk))
        if L_checkpoints:
            # chunk counts at which to snapshot the accumulator
            marks = sorted({min(math.ceil(lc / Lc), n_chunks)
                            for lc in L_checkpoints})
            if marks[-1] != n_chunks:
                marks.append(n_chunks)
            results = {}
            state = lse_init((B, Th))
            done = 0
            for mark in marks:
                for g0 in range(done, mark, group):
                    g = min(group, mark - g0)
                    state = _accumulate_chunks(task, x, y, key, L, Lc, g,
                                               i0=jnp.asarray(g0),
                                               state=state)
                done = mark
                L_eff = min(mark * Lc, L)
                results[L_eff] = _finalize_bounds(state, S0, L_eff,
                                                  stepwise)
            return results
        state = lse_init((B, Th))
        for g0 in range(0, n_chunks, group):
            g = min(group, n_chunks - g0)
            state = _accumulate_chunks(task, x, y, key, L, Lc, g,
                                       i0=jnp.asarray(g0), state=state)

    return _finalize_bounds(state, S0, L, stepwise)


def _finalize_bounds(state: LogSumExpState, S0, L: int, stepwise: bool):
    lse_contrastive = lse_value(state)                       # [B, Th] l=1..L
    # fold in the l=0 term exactly
    lse_all = jnp.logaddexp(lse_contrastive, S0)
    pce_loss = lse_all - S0
    nmc_loss = lse_contrastive - S0
    pce = jnp.log(jnp.asarray(L + 1, jnp.float32)) - pce_loss
    nmc = jnp.log(jnp.asarray(L, jnp.float32)) - nmc_loss
    if not stepwise:
        pce, nmc = pce[:, -1], nmc[:, -1]
    return pce, nmc


def eval_eig_from_history(task, theta_0, x, y, L: int, key: jax.Array,
                          M: Optional[int] = None, batch_size: int = 40,
                          stepwise: bool = False, err_type: str = "se",
                          L_chunk: int = 32_768,
                          mesh: Optional[Mesh] = None
                          ) -> Dict[str, np.ndarray]:
    """Aggregate bounds from PRE-COMPUTED histories, mini-batched over the
    outer M axis (reference: utils/eval.py:83-140).  Used for baseline
    policies (random/grid/DAD traces) whose rollouts come from elsewhere.
    """
    M = x.shape[0] if M is None else min(M, x.shape[0])
    pce_list, nmc_list = [], []
    for start in range(0, M, batch_size):
        end = min(start + batch_size, M)
        key, k_eig = jax.random.split(key)
        pce, nmc = compute_eig_from_history(
            task, jax.tree_util.tree_map(lambda t: t[start:end], theta_0),
            x[start:end], y[start:end], L, k_eig, L_chunk=L_chunk,
            stepwise=stepwise, mesh=mesh)
        pce_list.append(np.asarray(pce))
        nmc_list.append(np.asarray(nmc))
    pce = np.concatenate(pce_list, axis=0)
    nmc = np.concatenate(nmc_list, axis=0)
    M_eff = pce.shape[0]
    pce_mean, pce_err = pce.mean(0), pce.std(0)
    nmc_mean, nmc_err = nmc.mean(0), nmc.std(0)
    if err_type == "se":
        pce_err, nmc_err = (pce_err / np.sqrt(M_eff),
                            nmc_err / np.sqrt(M_eff))
    elif err_type == "ci":
        pce_err, nmc_err = (1.96 * pce_err / np.sqrt(M_eff),
                            1.96 * nmc_err / np.sqrt(M_eff))
    elif err_type != "std":
        raise ValueError(f"unknown err_type {err_type!r}")
    return dict(pce_mean=pce_mean, pce_err=pce_err,
                nmc_mean=nmc_mean, nmc_err=nmc_err)


def eval_boed(model, params, task, T: int, L: int, M: int, batch_size: int,
              key: jax.Array, time_token: bool = False,
              stepwise: bool = False, err_type: str = "se",
              L_chunk: int = 32_768, mesh: Optional[Mesh] = None,
              n_query: Optional[int] = None,
              seq_mesh: Optional[Mesh] = None,
              logger=None) -> Dict[str, np.ndarray]:
    """Full EIG evaluation pipeline (reference: utils/eval.py:142-198):
    chunked greedy rollouts + bound computation + mean/err aggregation.

    ``seq_mesh``: optional mesh with a ``seq`` axis — shards the rollout's
    candidate-pool (token) axis across chips so huge final query pools
    (n_query_final=2000, reference config/eval/bed.yaml:10) scale past
    one chip's activation memory (SURVEY.md §5.7)."""
    from aline_tpu.eval.traces import get_traces  # local import (cycle)

    max_step = (M + batch_size - 1) // batch_size
    pce_list, nmc_list = [], []
    for step in range(max_step):
        key, k_batch, k_roll, k_eig = jax.random.split(key, 4)
        batch = task.sample_batch(k_batch, batch_size, n_query=n_query)
        if seq_mesh is not None:
            from aline_tpu.parallel.mesh import shard_query_pool
            batch = shard_query_pool(batch, seq_mesh)
        theta_0, x, y = get_traces(model, params, task, batch, T, k_roll,
                                   time_token)
        pce, nmc = compute_eig_from_history(
            task, theta_0, x, y, L, k_eig, L_chunk=L_chunk,
            stepwise=stepwise, mesh=mesh)
        pce_list.append(np.asarray(pce))
        nmc_list.append(np.asarray(nmc))
        if logger is not None:
            logger.info(f"Step {step}: PCE {pce_list[-1].mean(0)}, "
                        f"NMC {nmc_list[-1].mean(0)}")

    pce = np.concatenate(pce_list, axis=0)                   # [M(, Th)]
    nmc = np.concatenate(nmc_list, axis=0)
    M_eff = pce.shape[0]
    pce_mean, pce_err = pce.mean(0), pce.std(0)
    nmc_mean, nmc_err = nmc.mean(0), nmc.std(0)
    if err_type == "se":
        pce_err, nmc_err = (pce_err / np.sqrt(M_eff),
                            nmc_err / np.sqrt(M_eff))
    elif err_type == "ci":
        pce_err, nmc_err = (1.96 * pce_err / np.sqrt(M_eff),
                            1.96 * nmc_err / np.sqrt(M_eff))
    elif err_type != "std":
        raise ValueError(f"unknown err_type {err_type!r}")
    return dict(pce_mean=pce_mean, pce_err=pce_err,
                nmc_mean=nmc_mean, nmc_err=nmc_err)
