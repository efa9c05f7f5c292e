"""Tests for baseline policies, GP-AL classical baselines, AL curves, and
the trajectory-level / MLE losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.eval.al_curves import al_rollout_curves, compare_strategies
from aline_tpu.eval.eig_losses import (
    nmc_loss,
    pce_loss,
    pce_loss_score_gradient,
)
from aline_tpu.eval.gp_al_baselines import (
    acq_bald,
    acq_epig,
    acq_variance_reduction,
    active_learning_with_gp,
    compare_acquisition_methods,
    fit_gp,
    gp_posterior,
)
from aline_tpu.eval.mle_losses import (
    chamfer_nmle_loss,
    l2_distance,
    nmle_loss,
    set_nmle_loss,
    sorted_nmle_loss,
)
from aline_tpu.models import build_model
from aline_tpu.models.baselines import (
    GridDesign,
    RandomDesign,
    SetEquivariantDesignNetwork,
    run_trace,
)
from aline_tpu.tasks import build_task


class TestBaselinePolicies:
    def test_random_design(self, rng_key):
        rd = RandomDesign(dim_x=2, random_type="uniform")
        d = rd.design_candidates(rng_key, 4, 7)
        assert d.shape == (4, 7, 2)
        assert (np.asarray(d) >= 0).all() and (np.asarray(d) <= 1).all()
        xi, lp = rd(rng_key, 5)
        assert xi.shape == (5, 2) and lp.shape == (5,)
        rn = RandomDesign(dim_x=1, random_type="normal")
        xi, lp = rn(rng_key, 5)
        assert np.isfinite(np.asarray(lp)).all()
        with pytest.raises(ValueError):
            RandomDesign(dim_x=1, random_type="bogus")

    def test_grid_design(self):
        gd = GridDesign(dim_x=2, design_scales=[2.0, 3.0])
        d = gd.design_candidates(batch_size=3, num_points=4)
        assert d.shape == (3, 16, 2)
        assert float(d[..., 0].max()) == pytest.approx(2.0)
        assert float(d[..., 1].max()) == pytest.approx(3.0)
        xi = gd(5, 3)
        assert xi.shape == (3, 2)
        with pytest.raises(ValueError):
            GridDesign(dim_x=2, design_scales=[1.0])

    def test_dad_run_trace(self, rng_key):
        cfg = parse_overrides(["task=location_finding",
                               "task.n_query_init=5"])
        task = build_task(cfg.task)
        net = SetEquivariantDesignNetwork(dim_x=2, dim_y=1, hidden_dim=16,
                                          encoding_dim=8)
        params = net.init(rng_key, jnp.zeros((2, 4, 2)),
                          jnp.zeros((2, 4, 1)), jnp.zeros((2, 4), bool))
        theta, xs, ys = run_trace(net, params, task, T=4, M=6, key=rng_key)
        assert theta.shape == (6, 1, 2)
        assert xs.shape == (6, 4, 2)
        assert ys.shape == (6, 4, 1)
        assert np.isfinite(np.asarray(ys)).all()


class TestGPALBaselines:
    def _problem(self, rng_key, B=2, P=14, Nt=6, n_ctx=4):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.uniform(k1, (B, P, 1), minval=-2, maxval=2)
        tx = jax.random.uniform(k2, (B, Nt, 1), minval=-2, maxval=2)
        f = lambda a: jnp.sin(2 * a)
        y = f(x) + 0.05 * jax.random.normal(k1, (B, P, 1))
        ty = f(tx) + 0.05 * jax.random.normal(k2, (B, Nt, 1))
        return x, y, tx, ty, n_ctx

    def test_gp_fit_and_posterior(self, rng_key):
        x = jnp.linspace(-2, 2, 20)[:, None]
        y = jnp.sin(2 * x[:, 0]) + 0.01 * jax.random.normal(rng_key, (20,))
        mask = jnp.ones(20, bool)
        params = fit_gp(x, y, mask, n_steps=120)
        mean, var, noise = gp_posterior(params, x, y, mask, x)
        # interpolation should be accurate at the training points
        assert float(jnp.sqrt(jnp.mean((mean - y) ** 2))) < 0.1
        assert (np.asarray(var) > 0).all()

    def test_masked_rows_do_not_influence_fit(self, rng_key):
        x = jnp.linspace(-2, 2, 10)[:, None]
        y = jnp.sin(x[:, 0])
        mask = jnp.ones(10, bool).at[7:].set(False)
        p1 = fit_gp(x, y, mask, n_steps=40)
        # garbage in the masked rows must not change anything
        y2 = y.at[7:].set(1e3)
        p2 = fit_gp(x, y2, mask, n_steps=40)
        np.testing.assert_allclose(np.asarray(p1.log_ls),
                                   np.asarray(p2.log_ls), rtol=1e-5)
        xs = jnp.array([[0.3]])
        m1, v1, _ = gp_posterior(p1, x, y, mask, xs)
        m2, v2, _ = gp_posterior(p2, x, y2, mask, xs)
        np.testing.assert_allclose(float(m1[0]), float(m2[0]), rtol=1e-5)

    def test_driver_curves_improve(self, rng_key):
        x, y, tx, ty, n_ctx = self._problem(rng_key)
        out = active_learning_with_gp(x, y, tx, ty, n_ctx, T=6,
                                      key=rng_key,
                                      acquisition="uncertainty",
                                      fit_steps=60)
        assert out["rmse"].shape == (2, 7)
        assert out["log_prob"].shape == (2, 7)
        # more data → posterior at targets should not get much worse
        assert float(out["rmse"][:, -1].mean()) <= \
            float(out["rmse"][:, 0].mean()) + 0.05

    @pytest.mark.slow  # smoke over all 6 acquisitions (analysis-only path)
    def test_all_acquisitions_run(self, rng_key):
        x, y, tx, ty, n_ctx = self._problem(rng_key, B=1, P=10, Nt=4)
        res = compare_acquisition_methods(x, y, tx, ty, n_ctx, T=3,
                                          key=rng_key, fit_steps=25)
        assert set(res) == {"uncertainty", "ucb", "variance_reduction",
                            "epig", "bald", "random"}
        for name, out in res.items():
            assert np.isfinite(np.asarray(out["rmse"])).all(), name

    def test_acquisition_scores_sane(self, rng_key):
        x = jnp.linspace(-2, 2, 12)[:, None]
        y = jnp.sin(x[:, 0])
        mask = jnp.ones(12, bool).at[6:].set(False)
        params = fit_gp(x, y, mask, n_steps=60)
        tx = jnp.array([[0.0], [1.0]])
        vr = acq_variance_reduction(params, x, y, mask, x, tx, rng_key)
        ep = acq_epig(params, x, y, mask, x, tx, rng_key)
        ba = acq_bald(params, x, y, mask, x, tx, rng_key)
        for s in (vr, ep, ba):
            assert (np.asarray(s) >= 0).all()


class TestALCurves:
    def _setup(self, rng_key):
        cfg = parse_overrides(["task=al_mix", "task.dim_x=1",
                               "task.n_target_theta=2",
                               "task.n_context_init=1",
                               "task.n_query_init=10",
                               "task.n_target_data=5"])
        task = build_task(cfg.task)
        model = build_model(cfg)
        batch = task.sample_batch(rng_key, 4)
        params = model.init(rng_key, batch, training=False)
        return model, params, batch

    @pytest.mark.slow
    def test_curve_shapes(self, rng_key):
        model, params, batch = self._setup(rng_key)
        out = al_rollout_curves(model, params, batch, T=5, key=rng_key)
        assert out["log_prob"].shape == (4, 6)
        assert out["rmse"].shape == (4, 6)
        assert out["idx"].shape == (4, 5)
        idx = np.asarray(out["idx"])
        for b in range(4):  # no repeats
            assert len(set(idx[:, b].tolist())) == len(idx[:, b]) or \
                len(set(idx[b].tolist())) == 5

    def test_all_strategies(self, rng_key):
        model, params, batch = self._setup(rng_key)
        res = compare_strategies(model, params, batch, T=4, key=rng_key)
        assert set(res) == {"aline", "random", "uncertainty"}
        for name, out in res.items():
            assert np.isfinite(np.asarray(out["log_prob"])).all(), name

    def test_unknown_strategy_raises(self, rng_key):
        model, params, batch = self._setup(rng_key)
        with pytest.raises(ValueError):
            al_rollout_curves(model, params, batch, T=2, key=rng_key,
                              strategy="bogus")


class TestTrajectoryEIGLosses:
    def test_pce_nmc_score_consistency(self, rng_key):
        cfg = parse_overrides(["task=location_finding",
                               "task.n_query_init=5"])
        task = build_task(cfg.task)
        k1, k2, k3 = jax.random.split(rng_key, 3)
        B, T, L = 3, 4, 32
        theta0 = task.sample_theta(k1, (B,))
        x = task.sample_data(k2, B, T)
        y = task.simulate(k3, x, theta0[:, None])
        thetas = jnp.concatenate(
            [theta0[None], task.sample_theta(k1, (L, B))], axis=0)
        p = float(pce_loss(task, y, x, thetas))
        n = float(nmc_loss(task, y, x, thetas))
        assert np.isfinite(p) and np.isfinite(n)
        # logsumexp including l=0 >= excluding it → pce_loss >= nmc_loss
        assert p >= n
        # score-gradient loss has the same VALUE structure: its forward
        # value is -(g*lp0 - lse) with g = lp0 - lse detached
        s = float(pce_loss_score_gradient(task, y, x, thetas))
        assert np.isfinite(s)


class TestMLELosses:
    def test_nmle(self, np_rng):
        target = jnp.asarray(np_rng.normal(size=(4, 3)), jnp.float32)
        from aline_tpu.distributions.gmm import normal_log_prob
        loss = nmle_loss(lambda t: normal_log_prob(t, 0.0, 1.0), target)
        ref = -np.sum(
            -0.5 * np.asarray(target) ** 2 - 0.5 * np.log(2 * np.pi),
            axis=1).mean()
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_sorted_and_permutation_invariance(self, np_rng):
        loc = jnp.asarray(np_rng.normal(size=(2, 3, 1)), jnp.float32)
        scale = jnp.ones((2, 3, 1))
        target = jnp.asarray(np_rng.normal(size=(2, 3, 1)), jnp.float32)
        l1 = float(sorted_nmle_loss(loc, scale, target))
        perm = target[:, ::-1]
        l2 = float(sorted_nmle_loss(loc, scale, perm))
        np.testing.assert_allclose(l1, l2, rtol=1e-5)
        c1 = float(chamfer_nmle_loss(loc, scale, target))
        c2 = float(chamfer_nmle_loss(loc, scale, perm))
        np.testing.assert_allclose(c1, c2, rtol=1e-5)
        s1 = float(set_nmle_loss(loc, scale, target))
        s2 = float(set_nmle_loss(loc, scale, perm))
        np.testing.assert_allclose(s1, s2, rtol=1e-5)

    def test_l2_distance_zero_for_perfect_tight_posterior(self, rng_key):
        target = jnp.ones((2, 3, 1))
        d = float(l2_distance(rng_key, target, jnp.full((2, 3, 1), 1e-4),
                              target, N=100))
        assert d < 1e-2
