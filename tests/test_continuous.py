"""Continuous-design (DAD-style) rollout and training tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.models import build_model
from aline_tpu.train.continuous import (
    make_continuous_batch,
    rollout_continuous,
)
from aline_tpu.train.loss import total_loss
from aline_tpu.train.rollout import RolloutOutputs
from aline_tpu.tasks import build_task

B, T = 4, 4


@pytest.fixture(scope="module")
def cont():
    """Shared (cfg, task, model, batch, params) — model init and the task
    build dominate per-test cost, and every test here is read-only."""
    cfg = parse_overrides(["task=location_finding",
                           "task.n_query_init=1"])
    cfg.head.continuous = True
    cfg.embedder.continuous = True
    task = build_task(cfg.task)
    model = build_model(cfg)
    key = jax.random.key(0)
    batch = make_continuous_batch(task, key, B, T)
    params = model.init(key, batch, training=False)
    return cfg, task, model, batch, params


class TestContinuousRollout:
    def test_batch_layout(self, cont):
        cfg, task, model, batch, params = cont
        assert batch.x.shape == (B, 1 + T + 1, 2)
        np.testing.assert_array_equal(np.asarray(batch.ctx_mask[:, 0]), True)
        np.testing.assert_array_equal(np.asarray(batch.ctx_mask[:, 1:]),
                                      False)

    def test_rollout_fills_buffer(self, cont):
        cfg, task, model, batch, params = cont
        w = jnp.ones((2,)) / 2.0
        ro = rollout_continuous(model, params, task, batch, T, w, w,
                                jax.random.key(0), training=True)
        assert ro.log_probs.shape == (T, B)
        assert ro.xs.shape == (T, B, 2)
        assert ro.ys.shape == (T, B, 1)
        assert np.isfinite(np.asarray(ro.nll_pred)).all()
        assert np.isfinite(np.asarray(ro.log_probs)).all()

    def test_greedy_emits_policy_mean(self, cont):
        cfg, task, model, batch, params = cont
        w = jnp.ones((2,)) / 2.0
        ro1 = rollout_continuous(model, params, task, batch, T, w, w,
                                 jax.random.key(1), training=False)
        # outcomes depend on the sim key, but designs must be deterministic
        ro2 = rollout_continuous(model, params, task, batch, T, w, w,
                                 jax.random.key(1), training=False)
        np.testing.assert_array_equal(np.asarray(ro1.xs), np.asarray(ro2.xs))

    def test_trainable_with_reinforce(self, cont):
        cfg, task, model, batch, params = cont
        w = jnp.ones((2,)) / 2.0

        def loss_fn(p):
            ro = rollout_continuous(model, p, task, batch, T, w, w,
                                    jax.random.key(2), training=True)
            ro_std = RolloutOutputs(ro.log_probs, ro.nll_query, ro.nll_pred,
                                    None, ro.xs, ro.ys, None)
            loss, m = total_loss(ro_std, 0.95, jnp.asarray(1.0))
            return loss

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        # policy (predictor) params must receive gradient signal
        flat = jax.tree_util.tree_leaves_with_path(g)
        pred = [np.abs(np.asarray(v)).sum() for path, v in flat
                if "predictor" in "/".join(str(p) for p in path)]
        assert sum(pred) > 0


class TestPolicyStdClip:
    def test_config_bounds_exploration_std(self):
        """head.policy_log_std_min/max bound the rollout's exploration std
        (guards against the observed failure modes: std collapse to ~0 and
        saturation at e^2)."""
        cfg = parse_overrides(["task=location_finding",
                               "task.n_query_init=1",
                               "head.policy_log_std_min=-3.0",
                               "head.policy_log_std_max=0.0"])
        cfg.head.continuous = True
        cfg.embedder.continuous = True
        task = build_task(cfg.task)
        model = build_model(cfg)
        key = jax.random.key(0)
        batch = make_continuous_batch(task, key, B, T)
        params = model.init(key, batch, training=False)
        w = jnp.ones((2,)) / 2.0
        ro = rollout_continuous(model, params, task, batch, T, w, w,
                                jax.random.key(2), training=True)
        stds = np.asarray(ro.stds)
        assert stds.shape == (T, B, 2)
        assert (stds >= np.exp(-3.0) - 1e-6).all()
        assert (stds <= np.exp(0.0) + 1e-6).all()
