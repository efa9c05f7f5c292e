"""QUEST+/PSI grid-Bayes baseline tests (aline_tpu/eval/psi.py).

The reference has no runnable counterpart (its notebook loads precomputed
QuestPlus/PSI .npy results that are absent from the snapshot —
reference: notebooks/eval_psychometric.ipynb cell 3), so these tests pin
the method against first-principles recomputations instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.eval.psi import (info_gain, make_theta_grid,
                                psi_rollout_curves)
from aline_tpu.tasks import PsychometricTask


@pytest.fixture(scope="module")
def task():
    cfg = parse_overrides(["task=psychometric"]).task
    return PsychometricTask(cfg)


@pytest.fixture(scope="module")
def tiny_grid(task):
    return make_theta_grid(task, n_axis=(5, 4, 3, 2))


def _brute_posterior(task, grid, x_seen, y_seen):
    """Direct Bayes on the grid with the task's own likelihood."""
    theta = np.asarray(grid["theta"])                        # [G, 4]
    log_post = np.zeros(theta.shape[0])
    for x, y in zip(x_seen, y_seen):
        p = np.asarray(task.psychometric_function(
            jnp.full((1, 1), x), jnp.asarray(theta)[:, None, :]))[..., 0, 0]
        log_post += np.log(p + 1e-10) if y else np.log(1 - p + 1e-10)
    post = np.exp(log_post - log_post.max())
    return post / post.sum()


class TestGridPosterior:
    def test_update_matches_brute_force(self, task, tiny_grid):
        """The rollout's running posterior equals direct Bayes on the
        same (design, outcome) history."""
        key = jax.random.key(0)
        batch = task.sample_batch(key, 2, n_query=12)
        out = psi_rollout_curves(task, batch, T=4, key=key,
                                 mask=np.ones(4, bool), strategy="random",
                                 grid=tiny_grid, b_chunk=2)
        b = 0
        ctx0 = np.asarray(batch.ctx_mask[b])
        hist = list(np.flatnonzero(ctx0)) + list(out["idx"][b])
        x_seen = np.asarray(batch.x[b, :, 0])[hist]
        y_seen = np.asarray(batch.y[b, :, 0])[hist]
        post = _brute_posterior(task, tiny_grid, x_seen, y_seen)
        # recompute the final reported LL from the brute posterior
        shape = tiny_grid["shape"]
        lp = post.reshape(shape)
        theta_true = np.asarray(batch.target_all[b, :, 0])
        lls = []
        for d in range(4):
            other = tuple(i for i in range(4) if i != d)
            marg = lp.sum(axis=other)
            w = float(tiny_grid["widths"][d])
            lo = tiny_grid["ranges"][d][0]
            cell = int(np.clip((theta_true[d] - lo) // w, 0,
                               shape[d] - 1))
            lls.append(np.log(marg[cell]) - np.log(w))
        expect = np.mean(lls)                       # uniform mask weights
        np.testing.assert_allclose(out["log_prob"][b, -1], expect,
                                   rtol=1e-4, atol=1e-4)

    def test_no_reselection_and_pool_only(self, task, tiny_grid):
        key = jax.random.key(1)
        batch = task.sample_batch(key, 4, n_query=10)
        for strategy in ("psi", "random"):
            out = psi_rollout_curves(task, batch, T=8, key=key,
                                     mask=np.array([1, 1, 0, 0], bool),
                                     strategy=strategy, grid=tiny_grid,
                                     b_chunk=4)
            for b in range(4):
                idx = out["idx"][b]
                assert len(set(idx.tolist())) == len(idx), strategy
                ctx0 = np.flatnonzero(np.asarray(batch.ctx_mask[b]))
                assert not set(idx.tolist()) & set(ctx0.tolist()), strategy


class TestInfoGain:
    def test_full_mask_matches_expected_entropy_reduction(self, task,
                                                          tiny_grid):
        """I(y; theta) == H(post) - E_y[H(post | y)] on a tiny case."""
        rng = np.random.default_rng(0)
        G = int(np.prod(tiny_grid["shape"]))
        N = 6
        post = rng.dirichlet(np.ones(G))
        P = rng.uniform(0.05, 0.95, (G, N))
        hbp = -(P * np.log(P) + (1 - P) * np.log(1 - P))
        got = np.asarray(info_gain(jnp.asarray(post), jnp.asarray(P),
                                   jnp.asarray(hbp), tiny_grid,
                                   subset=(0, 1, 2, 3)))

        def entropy(q):
            q = q / q.sum()
            return -(q * np.log(np.maximum(q, 1e-300))).sum()

        for n in range(N):
            p1 = float(post @ P[:, n])
            post1 = post * P[:, n] / p1
            post0 = post * (1 - P[:, n]) / (1 - p1)
            expect = (entropy(post) - p1 * entropy(post1)
                      - (1 - p1) * entropy(post0))
            np.testing.assert_allclose(got[n], expect, rtol=1e-5,
                                       atol=1e-7)

    def test_subset_mask_matches_marginal_entropy_reduction(self, task,
                                                            tiny_grid):
        """I(y; theta_S) == H(marg_S) - E_y[H(marg_S | y)] — the QUEST+
        targeted criterion, checked via the MI symmetry it exploits."""
        rng = np.random.default_rng(1)
        shape = tiny_grid["shape"]
        G = int(np.prod(shape))
        N = 5
        subset = (0, 1)
        post = rng.dirichlet(np.ones(G))
        P = rng.uniform(0.05, 0.95, (G, N))
        hbp = -(P * np.log(P) + (1 - P) * np.log(1 - P))
        got = np.asarray(info_gain(jnp.asarray(post), jnp.asarray(P),
                                   jnp.asarray(hbp), tiny_grid,
                                   subset=subset))

        def marg_entropy(q):
            q = q / q.sum()
            m = q.reshape(shape).sum(axis=(2, 3)).reshape(-1)
            return -(m * np.log(np.maximum(m, 1e-300))).sum()

        for n in range(N):
            p1 = float(post @ P[:, n])
            post1 = post * P[:, n] / p1
            post0 = post * (1 - P[:, n]) / (1 - p1)
            expect = (marg_entropy(post) - p1 * marg_entropy(post1)
                      - (1 - p1) * marg_entropy(post0))
            np.testing.assert_allclose(got[n], expect, rtol=1e-5,
                                       atol=1e-7)


class TestPsiQuality:
    def test_psi_beats_random_designs(self, task):
        """On the targeted (alpha, beta) mask, PSI designs must yield a
        clearly better grid posterior than random designs after T trials
        on the same subjects (statistical, seeded)."""
        key = jax.random.key(2)
        batch = task.sample_batch(key, 24, n_query=60)
        grid = make_theta_grid(task, n_axis=(21, 11, 5, 4))
        mask = np.array([1, 1, 0, 0], bool)
        psi = psi_rollout_curves(task, batch, T=15, key=key, mask=mask,
                                 grid=grid, b_chunk=8)
        rnd = psi_rollout_curves(task, batch, T=15, key=key, mask=mask,
                                 strategy="random", grid=grid, b_chunk=8)
        d_ll = psi["log_prob"][:, -1] - rnd["log_prob"][:, -1]
        d_rmse = psi["rmse"][:, -1] - rnd["rmse"][:, -1]
        se = d_ll.std(ddof=1) / np.sqrt(len(d_ll))
        assert d_ll.mean() > 2 * se, (d_ll.mean(), se)
        assert d_rmse.mean() < 0, d_rmse.mean()

    def test_curves_shapes(self, task, tiny_grid):
        key = jax.random.key(3)
        batch = task.sample_batch(key, 3, n_query=9)
        out = psi_rollout_curves(task, batch, T=5, key=key,
                                 mask=np.ones(4, bool), grid=tiny_grid,
                                 b_chunk=2)
        assert out["log_prob"].shape == (3, 6)
        assert out["rmse"].shape == (3, 6)
        assert out["idx"].shape == (3, 5)
        assert np.isfinite(out["log_prob"]).all()
        assert np.isfinite(out["rmse"]).all()
