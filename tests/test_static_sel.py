"""Static mask-variant key-set specialization (CompactKeys.ext_idx).

The compact attention path keeps every target token as a potential key
column and masks the unselected ones to -1e9. When the epoch's target
mask is known at trace time, the never-visible columns can be sliced out
statically — exp(-1e9) underflows to exactly 0.0 in f32, so the sliced
path is mathematically identical; bit-level output may differ at float
reassociation scale (~1e-7) because XLA tree-reduces the narrower
contraction in a different order. These tests pin that equivalence at
every level: single forward, rollout gradients, and the Trainer's
per-variant step cache + auto-disable guard.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.models import build_model
from aline_tpu.tasks import GPTask
from aline_tpu.tasks.base import init_ctx_idx
from aline_tpu.train.loop import Trainer
from aline_tpu.train.rollout import rollout
from aline_tpu.train.loss import total_loss


def small_cfg(**over):
    cfg = parse_overrides(["task=al_mix", "task.dim_x=1",
                           "task.n_target_theta=2",
                           "task.n_context_init=2",
                           "task.n_query_init=8",
                           "task.n_target_data=4",
                           "min_T=3", "T=3", "batch_size=4",
                           "burning_epoch=0", "max_epoch=6",
                           "checkpoint=0", "verbose=1000", "mesh_data=1"])
    for k, v in over.items():
        parts = k.split(".")
        tgt = cfg
        for p in parts[:-1]:
            tgt = getattr(tgt, p)
        setattr(tgt, parts[-1], v)
    return cfg


def make_ready_batch(cfg, mask, key, B=4, T=3):
    task = GPTask(cfg.task)
    batch = task.sample_batch(key, B)
    batch = batch.replace(target_mask=jnp.asarray(mask))
    return init_ctx_idx(batch, min(task.n_context_init + T, batch.n_points))


MASKS = {
    "theta": np.array([False] * 4 + [True, True]),
    "data": np.array([True] * 4 + [False, False]),
    "sparse": np.array([True, False, True, False, False, True]),
    "none": np.zeros(6, bool),
}


class TestForwardExactness:
    @pytest.mark.parametrize("mask_name", list(MASKS))
    def test_forward_identical(self, mask_name):
        cfg = small_cfg()
        mask = MASKS[mask_name]
        model = build_model(cfg)
        batch = make_ready_batch(cfg, mask, jax.random.key(0))
        params = model.init(jax.random.key(1), batch, training=False)
        sel = tuple(int(i) for i in np.flatnonzero(mask))

        out_gen = model.apply(params, batch, training=False)
        out_sel = model.apply(params, batch, training=False,
                              sel_targets=sel)

        np.testing.assert_allclose(
            np.asarray(out_gen.design_out.zt),
            np.asarray(out_sel.design_out.zt), rtol=1e-5, atol=1e-6)
        for field in ("mixture_means", "mixture_stds", "mixture_weights"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_gen.posterior_out, field)),
                np.asarray(getattr(out_sel.posterior_out, field)),
                rtol=1e-5, atol=1e-6)
        pq_g, pq_s = out_gen.posterior_out_query, out_sel.posterior_out_query
        if pq_g is not None:
            np.testing.assert_allclose(
                np.asarray(pq_g.mixture_means),
                np.asarray(pq_s.mixture_means), rtol=1e-5, atol=1e-6)

    def test_forward_identical_with_time_token(self):
        cfg = small_cfg(**{"encoder.with_time_token": True,
                           "time_token": True})
        mask = MASKS["theta"]
        model = build_model(cfg)
        batch = make_ready_batch(cfg, mask, jax.random.key(0))
        batch = batch.replace(t=jnp.asarray(0.5, jnp.float32))
        params = model.init(jax.random.key(1), batch, training=False)
        sel = tuple(int(i) for i in np.flatnonzero(mask))
        out_gen = model.apply(params, batch, training=False)
        out_sel = model.apply(params, batch, training=False,
                              sel_targets=sel)
        np.testing.assert_allclose(
            np.asarray(out_gen.design_out.zt),
            np.asarray(out_sel.design_out.zt), rtol=1e-5, atol=1e-6)


class TestRolloutGradExactness:
    def test_rollout_loss_and_grads_identical(self):
        cfg = small_cfg()
        mask = MASKS["theta"]
        model = build_model(cfg)
        batch = make_ready_batch(cfg, mask, jax.random.key(0))
        params = model.init(jax.random.key(1), batch, training=False)
        sel = tuple(int(i) for i in np.flatnonzero(mask))
        w = mask.astype(np.float32)
        w_q = jnp.asarray(w / w.sum())
        w_p = jnp.asarray(np.ones_like(w) / len(w))

        def loss(p, sel_targets):
            ro = rollout(model, p, batch, 3, w_q, w_p, jax.random.key(2),
                         training=True, sel_targets=sel_targets)
            return total_loss(ro, 1.0, jnp.asarray(1.0))[0]

        (l_gen, g_gen) = jax.value_and_grad(lambda p: loss(p, None))(params)
        (l_sel, g_sel) = jax.value_and_grad(lambda p: loss(p, sel))(params)
        np.testing.assert_allclose(np.asarray(l_gen), np.asarray(l_sel),
                                   rtol=1e-5, atol=1e-6)
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_gen)[0],
                jax.tree_util.tree_flatten_with_path(g_sel)[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=str(kp))


class TestEvalCurves:
    def test_al_rollout_curves_auto_specialization(self):
        """al_rollout_curves derives the static key set from the eval
        mask — its curves must match the dense naive attention path."""
        from aline_tpu.eval.al_curves import al_rollout_curves

        mask = MASKS["theta"]
        outs = {}
        for impl in ("auto", "naive"):
            cfg = small_cfg(**{"encoder.attention_impl": impl})
            model = build_model(cfg)
            batch = make_ready_batch(cfg, mask, jax.random.key(0))
            params = model.init(jax.random.key(1), batch, training=False)
            outs[impl] = al_rollout_curves(model, params, batch, 3,
                                           jax.random.key(2))
        np.testing.assert_array_equal(np.asarray(outs["auto"]["idx"]),
                                      np.asarray(outs["naive"]["idx"]))
        np.testing.assert_allclose(np.asarray(outs["auto"]["log_prob"]),
                                   np.asarray(outs["naive"]["log_prob"]),
                                   rtol=1e-4, atol=1e-5)


class TestTrainerIntegration:
    def _run(self, static_on, n_epochs=6):
        cfg = small_cfg()
        cfg.static_mask_keys = static_on
        cfg.output_dir = f"/tmp/test_static_sel_{static_on}"
        tr = Trainer(cfg)
        tr._ensure_phase("main")
        return [float(tr.train_epoch(e)["loss"]) for e in range(n_epochs)]

    def test_identical_training_trajectory(self):
        np.testing.assert_allclose(self._run(True), self._run(False),
                                   rtol=1e-4, atol=1e-5)

    def test_split_mask_uses_two_variants(self):
        cfg = small_cfg()
        cfg.output_dir = "/tmp/test_static_sel_variants"
        tr = Trainer(cfg)
        tr._ensure_phase("main")
        for e in range(8):
            tr.train_epoch(e)
        # split mode: data mask (4/6 selected) and theta mask (2/6) both
        # get a sliced variant; 'all' would share the generic step
        assert 1 <= len(tr._sel_variants) <= 2
        assert not tr._sel_disabled

    def test_random_mask_universe_disables(self):
        """A task that keeps producing fresh masks (e.g. partial/random
        subsets) must fall back to the generic step instead of compiling
        unboundedly many variants."""
        cfg = small_cfg()
        cfg.static_mask_keys_max = 2
        cfg.output_dir = "/tmp/test_static_sel_random"
        tr = Trainer(cfg)
        masks = [np.array(m) for m in
                 ([1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
                  [0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 0, 0])]
        sels = [tr._static_sel(m.astype(bool)) for m in masks]
        assert sels[0] == (0,) and sels[1] == (1,)
        assert sels[3] is None          # cap exceeded -> disabled
        assert tr._sel_disabled
        # once disabled, even previously seen masks get the generic step
        assert tr._static_sel(masks[0].astype(bool)) is None
        # an all-True mask never creates a variant
        tr2 = Trainer(cfg)
        assert tr2._static_sel(np.ones(6, bool)) is None
        assert not tr2._sel_variants
