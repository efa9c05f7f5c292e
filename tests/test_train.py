"""Training-loop tests: rollout semantics, REINFORCE loss parity with the
reference formulas, optimizer phases, checkpoint resume, loss decrease."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.models import build_model
from aline_tpu.ops.target_mask import target_weight_vectors
from aline_tpu.tasks import build_task
from aline_tpu.train import (
    Trainer,
    build_optimizer,
    clip_by_inf_norm,
    predictor_partition,
    reinforce_losses,
    rollout,
)
from aline_tpu.train.rollout import RolloutOutputs


def tiny_cfg(tmp=None, **over):
    args = ["task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
            "task.n_context_init=1", "task.n_query_init=8",
            "task.n_target_data=4", "batch_size=6", "min_T=4", "T=4",
            "max_epoch=6", "burning_epoch=3", "checkpoint=0", "verbose=100"]
    args += [f"{k}={v}" for k, v in over.items()]
    cfg = parse_overrides(args)
    if tmp is not None:
        cfg.output_dir = str(tmp)
    return cfg


class TestRollout:
    def _setup(self, rng_key, **over):
        cfg = tiny_cfg(**over)
        task = build_task(cfg.task)
        model = build_model(cfg)
        batch = task.sample_batch(rng_key, 5)
        params = model.init(rng_key, batch, training=False)
        w_q, w_p = target_weight_vectors(
            np.ones(6, bool), "mix", "all", 4, 2)
        return cfg, task, model, batch, params, w_q, w_p

    def test_shapes_and_unique_designs(self, rng_key):
        cfg, task, model, batch, params, w_q, w_p = self._setup(rng_key)
        ro = rollout(model, params, batch, 4, jnp.asarray(w_q),
                     jnp.asarray(w_p), rng_key, training=True)
        assert ro.log_probs.shape == (4, 5)
        assert ro.nll_query.shape == (4, 5)
        assert ro.idx.shape == (4, 5)
        assert ro.xs.shape == (4, 5, 1)
        idx = np.asarray(ro.idx)
        # no design chosen twice per batch element
        for b in range(5):
            assert len(set(idx[:, b])) == 4
        # context grew by exactly T
        assert int(ro.final_ctx_mask.sum()) == 5 * (1 + 4)

    def test_unroll_and_remat_policy_equal_defaults(self, rng_key):
        """Perf knobs (scan unroll, dots remat policy) must not change the
        trajectory or the recorded losses."""
        cfg, task, model, batch, params, w_q, w_p = self._setup(rng_key)
        kw = dict(training=True)
        ro0 = rollout(model, params, batch, 4, jnp.asarray(w_q),
                      jnp.asarray(w_p), rng_key, **kw)
        ro_u = rollout(model, params, batch, 4, jnp.asarray(w_q),
                       jnp.asarray(w_p), rng_key, unroll=2, **kw)
        ro_d = rollout(model, params, batch, 4, jnp.asarray(w_q),
                       jnp.asarray(w_p), rng_key, remat_policy="dots", **kw)
        for ro in (ro_u, ro_d):
            np.testing.assert_array_equal(np.asarray(ro.idx),
                                          np.asarray(ro0.idx))
            np.testing.assert_allclose(np.asarray(ro.nll_pred),
                                       np.asarray(ro0.nll_pred), rtol=1e-6)

    def test_chosen_xy_match_buffer(self, rng_key):
        cfg, task, model, batch, params, w_q, w_p = self._setup(rng_key)
        ro = rollout(model, params, batch, 3, jnp.asarray(w_q),
                     jnp.asarray(w_p), rng_key, training=True)
        idx = np.asarray(ro.idx)
        for t in range(3):
            for b in range(5):
                np.testing.assert_array_equal(
                    np.asarray(ro.xs[t, b]), np.asarray(batch.x[b, idx[t, b]]))
                np.testing.assert_array_equal(
                    np.asarray(ro.ys[t, b]), np.asarray(batch.y[b, idx[t, b]]))

    def test_greedy_rollout_deterministic(self, rng_key):
        cfg, task, model, batch, params, w_q, w_p = self._setup(rng_key)
        ro1 = rollout(model, params, batch, 3, jnp.asarray(w_q),
                      jnp.asarray(w_p), rng_key, training=False)
        ro2 = rollout(model, params, batch, 3, jnp.asarray(w_q),
                      jnp.asarray(w_p), jax.random.key(99), training=False)
        np.testing.assert_array_equal(np.asarray(ro1.idx),
                                      np.asarray(ro2.idx))

    def test_differentiable(self, rng_key):
        cfg, task, model, batch, params, w_q, w_p = self._setup(rng_key)

        def f(p):
            ro = rollout(model, p, batch, 3, jnp.asarray(w_q),
                         jnp.asarray(w_p), rng_key, training=True)
            return jnp.mean(ro.nll_pred) + jnp.mean(ro.log_probs)

        grads = jax.grad(f)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves)


class TestReinforceLoss:
    def test_matches_reference_formula(self, np_rng):
        """Re-derive the reference loss (train_aline.py:112-125) in numpy."""
        T, B = 5, 7
        gamma = 0.9
        log_probs = np_rng.normal(size=(T, B)).astype(np.float32)
        nll_q = np_rng.normal(size=(T, B)).astype(np.float32)
        nll_p = np_rng.normal(size=(T, B)).astype(np.float32)
        ro = RolloutOutputs(jnp.array(log_probs), jnp.array(nll_q),
                            jnp.array(nll_p), None, None, None, None)
        design_loss, predict_loss = reinforce_losses(ro, gamma)

        # reference computation (batch-first layout)
        R = []
        for t in range(1, T):
            gain = np.clip(nll_q[t - 1] - nll_q[t], 0.0, None)
            R.append((gamma ** t) * gain)
        R = np.stack(R, axis=1)                               # [B, T-1]
        R = (R - R.mean(0, keepdims=True)) / (R.std(0, ddof=1,
                                                    keepdims=True) + 1e-9)
        ref_design = -np.mean(log_probs.T[:, :-1] * R)
        ref_predict = np.mean(nll_p)
        np.testing.assert_allclose(float(design_loss), ref_design,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(predict_loss), ref_predict,
                                   rtol=1e-5)

    def test_reward_is_detached(self, np_rng):
        """Gradient flows only through log_probs, not through nll_query."""
        T, B = 4, 3
        base = jnp.asarray(np_rng.normal(size=(T, B)), jnp.float32)

        def f(x):
            ro = RolloutOutputs(base, x, x, None, None, None, None)
            d, _ = reinforce_losses(ro, 1.0)
            return d

        g = jax.grad(f)(base)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestOptimizer:
    def test_inf_norm_clip(self):
        clip = clip_by_inf_norm(1.0)
        grads = {"a": jnp.array([3.0, -6.0]), "b": jnp.array([0.5])}
        state = clip.init(grads)
        clipped, _ = clip.update(grads, state)
        # ||g||_inf = 6 → scale = 1/(6+1e-6)
        np.testing.assert_allclose(np.asarray(clipped["a"]),
                                   [0.5, -1.0], rtol=1e-4)
        np.testing.assert_allclose(float(clipped["b"][0]), 0.5 / 6, rtol=1e-4)
        # below threshold: unchanged
        small = {"a": jnp.array([0.2]), "b": jnp.array([-0.4])}
        out, _ = clip.update(small, clip.init(small))
        np.testing.assert_allclose(np.asarray(out["b"]), [-0.4], rtol=1e-6)

    def test_predictor_partition(self):
        params = {"params": {
            "head": {"acquisition_head": {"predictor_fc1": {"kernel":
                                                            jnp.zeros(1)}}},
            "encoder": {"layer_0": {"qkv_proj": {"kernel": jnp.zeros(1)}}}}}
        labels = predictor_partition(params)
        flat = jax.tree_util.tree_leaves(labels)
        assert sorted(set(flat)) == ["predictor", "shared"]

    def test_main_phase_shared_lr_is_fifth(self, rng_key):
        """After burning, shared params move ~5x slower under equal grads."""
        cfg = tiny_cfg()
        params = {"x_predictor_w": jnp.ones(4), "shared_w": jnp.ones(4)}
        tx, _ = build_optimizer(cfg, params, "main")
        cfg2 = tiny_cfg(clip_grads="false")
        tx, _ = build_optimizer(cfg2, params, "main")
        state = tx.init(params)
        grads = {"x_predictor_w": jnp.full(4, 0.1),
                 "shared_w": jnp.full(4, 0.1)}
        upd, _ = tx.update(grads, state, params)
        r = float(jnp.abs(upd["shared_w"][0])
                  / jnp.abs(upd["x_predictor_w"][0]))
        assert abs(r - 0.2) < 0.02


class TestTrainer:
    def test_loss_decreases_on_prediction(self, tmp_path):
        cfg = tiny_cfg(tmp_path, max_epoch=16, burning_epoch=20)  # all burning
        trainer = Trainer(cfg)
        losses = [trainer.train_epoch(e)["loss"] for e in range(16)]
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), \
            f"prediction loss did not decrease: {losses[:3]} → {losses[-3:]}"

    @pytest.mark.slow
    def test_phase_switch_and_full_run(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        trainer = Trainer(cfg)
        trainer.train()
        assert trainer._phase == "main"
        # burning snapshot exists
        snap = os.path.join(str(tmp_path), "model", "aline_burning")
        assert os.path.exists(snap)

    @pytest.mark.slow
    def test_checkpoint_resume_bit_exact(self, tmp_path):
        cfg = tiny_cfg(tmp_path, max_epoch=8, burning_epoch=2,
                       checkpoint=4)
        t1 = Trainer(cfg)
        for e in range(4):
            t1.train_epoch(e)
        t1.save(4)
        m1 = t1.train_epoch(4)

        t2 = Trainer(cfg)
        t2._ensure_phase("main")
        t2.restore()
        assert t2.start_epoch == 4
        m2 = t2.train_epoch(4)
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-5)
        # params identical after the resumed step
        for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                        jax.tree_util.tree_leaves(t2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_load_checkpoint_missing_starts_fresh(self, tmp_path):
        """load_checkpoint=true on a fresh output dir must start from
        scratch (resume-if-present), not crash — relaunch wrappers pass
        the flag unconditionally."""
        cfg = tiny_cfg(tmp_path, max_epoch=2, burning_epoch=20,
                       load_checkpoint="true")
        trainer = Trainer(cfg)
        trainer.train()
        assert trainer.start_epoch == 0

    def test_burning_uses_shrunk_pool(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        trainer = Trainer(cfg)
        trainer.train_epoch(0)  # burning
        # pool size == cfg.T during burning → n_points = n_ctx + T
        sigs = list(trainer._sample_cache.keys())
        assert (cfg.batch_size, cfg.T) in sigs
        trainer.train_epoch(3)  # main
        assert (cfg.batch_size, cfg.task.n_query_init) in \
            trainer._sample_cache.keys()


class TestCtxIdxCarryRegression:
    """Regression for the stale-ctx_idx bug: a rollout with the
    incremental index buffer (init_ctx_idx, the Trainer path) must produce
    EXACTLY the same trajectory as the argsort-based compact path and the
    dense path."""

    @pytest.mark.slow  # the trainer-level variant below covers the same
    # regression fast; this exhaustive 3-path rollout comparison runs in
    # the slow tier
    def test_incremental_buffer_matches_argsort_and_dense(self, rng_key):
        import jax.numpy as jnp
        from aline_tpu.config import parse_overrides
        from aline_tpu.models import build_model
        from aline_tpu.ops.target_mask import target_weight_vectors
        from aline_tpu.tasks import build_task
        from aline_tpu.tasks.base import init_ctx_idx

        cfg = parse_overrides(["task=al_mix", "task.dim_x=1",
                               "task.n_target_theta=2",
                               "task.n_context_init=1",
                               "task.n_query_init=10",
                               "task.n_target_data=4"])
        task = build_task(cfg.task)
        model = build_model(cfg)
        batch = task.sample_batch(rng_key, 5)
        params = model.init(rng_key, batch, training=False)
        w_q, w_p = target_weight_vectors(np.ones(6, bool), "mix", "all",
                                         4, 2)
        w_q, w_p = jnp.asarray(w_q), jnp.asarray(w_p)
        T = 5

        ro_dense = rollout(model, params, batch, T, w_q, w_p, rng_key,
                           training=False)
        ro_argsort = rollout(model, params,
                             batch.replace(ctx_capacity=6), T, w_q, w_p,
                             rng_key, training=False)
        ro_incr = rollout(model, params, init_ctx_idx(batch, 6), T, w_q,
                          w_p, rng_key, training=False)

        np.testing.assert_array_equal(np.asarray(ro_dense.idx),
                                      np.asarray(ro_argsort.idx))
        np.testing.assert_array_equal(np.asarray(ro_dense.idx),
                                      np.asarray(ro_incr.idx))
        np.testing.assert_allclose(np.asarray(ro_argsort.nll_pred),
                                   np.asarray(ro_incr.nll_pred),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ro_dense.nll_pred),
                                   np.asarray(ro_incr.nll_pred),
                                   rtol=1e-4, atol=1e-5)

    def test_trainer_epoch_matches_argsort_path(self, tmp_path):
        """One Trainer epoch's loss must be identical whether the batch
        carries the incremental buffer or only the capacity."""
        import jax.numpy as jnp
        from aline_tpu.ops.target_mask import (create_target_mask,
                                               target_weight_vectors)
        from aline_tpu.tasks.base import init_ctx_idx
        from aline_tpu.train.loss import total_loss

        cfg = tiny_cfg(tmp_path)
        trainer = Trainer(cfg)
        key = jax.random.key(5)
        batch = trainer._sample_batch(key, 6, 8)
        mask = create_target_mask("split", "mix", 4, 2, attend_to="data")
        w_q, w_p = target_weight_vectors(mask, "mix", "split", 4, 2)
        batch = batch.replace(target_mask=jnp.asarray(mask))

        def loss_for(b):
            ro = rollout(trainer.model, trainer.params, b, 4,
                         jnp.asarray(w_q), jnp.asarray(w_p), key,
                         training=True)
            loss, _ = total_loss(ro, 1.0, jnp.asarray(1.0))
            return float(loss)

        l_arg = loss_for(batch.replace(ctx_capacity=5))
        l_incr = loss_for(init_ctx_idx(batch, 5))
        np.testing.assert_allclose(l_arg, l_incr, rtol=1e-5)
