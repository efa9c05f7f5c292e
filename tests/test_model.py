"""Model tests: role-mask equivalence with the reference mask construction,
forward shapes, pool masking of the acquisition softmax, GMM head math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import Config, GPTaskConfig, parse_overrides
from aline_tpu.models import build_model
from aline_tpu.models.heads import GMMTargetHead
from aline_tpu.ops.roles import NEG_INF, attention_bias, build_roles
from aline_tpu.tasks import GPTask, select_design


def small_cfg(**task_kw):
    cfg = parse_overrides(["task=al_mix", "task.dim_x=1",
                           "task.n_target_theta=2",
                           "task.n_context_init=2",
                           "task.n_query_init=8",
                           "task.n_target_data=4"])
    for k, v in task_kw.items():
        setattr(cfg.task, k, v)
    return cfg


def make_batch(cfg, key, B=3):
    task = GPTask(cfg.task)
    return task.sample_batch(key, B)


class TestRoleMask:
    def reference_mask(self, n_ctx, n_query, n_target, target_mask):
        """Build the reference additive mask on the
        [context | query | target] layout (reference: model/encoder.py:83-126)."""
        n_all = n_ctx + n_query + n_target
        mask = np.full((n_all, n_all), -np.inf, np.float32)
        mask[:, :n_ctx] = 0.0
        sel = np.where(target_mask)[0] + n_ctx + n_query
        mask[n_ctx:n_ctx + n_query, sel] = 0.0
        return mask

    def test_bias_matches_reference_layout(self):
        """Our role-derived bias on the [points | targets] layout must equal
        the reference mask after permuting points into ctx-first order."""
        n_points, n_target = 6, 4
        B = 1
        rng = np.random.default_rng(0)
        # random context assignment: 3 of 6 points are context
        ctx = np.zeros((B, n_points), bool)
        ctx_idx = [0, 2, 5]
        ctx[0, ctx_idx] = True
        tmask = np.array([True, False, True, False])

        roles = build_roles(jnp.array(ctx), n_target, jnp.array(tmask))
        bias = np.asarray(attention_bias(roles))[0, 0]       # [N, N]

        # permutation mapping our layout -> reference layout
        query_idx = [i for i in range(n_points) if i not in ctx_idx]
        perm = ctx_idx + query_idx + [n_points + t for t in range(n_target)]
        ours = bias[np.ix_(perm, perm)]
        ref = self.reference_mask(3, 3, n_target, tmask)
        np.testing.assert_array_equal(ours == 0.0, ref == 0.0)
        assert (ours[ref == -np.inf] <= NEG_INF).all()

    def test_none_mask_queries_attend_only_context(self):
        ctx = jnp.array([[True, False]])
        roles = build_roles(ctx, 2, jnp.zeros(2, bool))
        bias = np.asarray(attention_bias(roles))[0, 0]
        # query row (index 1): only column 0 (context) is open
        assert bias[1, 0] == 0.0
        assert (bias[1, 1:] <= NEG_INF).all()

    def test_time_token_roles(self):
        ctx = jnp.array([[True, False]])
        roles = build_roles(ctx, 1, jnp.ones(1, bool), with_time_token=True)
        bias = np.asarray(attention_bias(roles))[0, 0]       # [4, 4]
        # layout: [time, p0(ctx), p1(query), target]
        assert bias[2, 0] == 0.0      # query attends time token
        assert bias[1, 0] <= NEG_INF  # context does not attend time token
        assert bias[2, 3] == 0.0      # query attends selected target


class TestForward:
    def test_output_shapes(self, rng_key):
        cfg = small_cfg()
        model = build_model(cfg)
        batch = make_batch(cfg, rng_key)
        k_init, k_run = jax.random.split(rng_key)
        params = model.init(k_init, batch, training=False)
        out = model.apply(params, batch, training=True, rng=k_run)
        B, P = 3, 10
        assert out.design_out.idx.shape == (B,)
        assert out.design_out.log_prob.shape == (B,)
        assert out.design_out.zt.shape == (B, P)
        n_target = 6  # 4 data + 2 theta
        C = cfg.head.num_components
        assert out.posterior_out.mixture_means.shape == (B, n_target, C)
        assert out.posterior_out.mixture_stds.shape == (B, n_target, C)
        assert out.posterior_out.mixture_weights.shape == (B, n_target, C)
        assert out.posterior_out_query.mixture_means.shape == (B, P, C)
        w = np.asarray(out.posterior_out.mixture_weights)
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
        assert (np.asarray(out.posterior_out.mixture_stds) > 0).all()

    def test_design_never_selects_context(self, rng_key):
        cfg = small_cfg()
        model = build_model(cfg)
        batch = make_batch(cfg, rng_key, B=8)
        params = model.init(rng_key, batch, training=False)
        # consume a few more points
        batch, _, _ = select_design(batch, jnp.full((8,), 3))
        batch, _, _ = select_design(batch, jnp.full((8,), 7))
        for i in range(20):
            k = jax.random.fold_in(rng_key, i)
            out = model.apply(params, batch, training=True, rng=k)
            idx = np.asarray(out.design_out.idx)
            ctx = np.asarray(batch.ctx_mask)
            assert not ctx[np.arange(8), idx].any(), \
                "sampled a consumed/context point"
        # zt puts zero mass on context points
        out = model.apply(params, batch, training=True, rng=rng_key)
        zt = np.asarray(out.design_out.zt)
        assert (zt[np.asarray(batch.ctx_mask)] == 0).all()
        np.testing.assert_allclose(zt.sum(-1), 1.0, rtol=1e-5)

    def test_eval_mode_is_greedy_argmax(self, rng_key):
        cfg = small_cfg()
        model = build_model(cfg)
        batch = make_batch(cfg, rng_key)
        params = model.init(rng_key, batch, training=False)
        out1 = model.apply(params, batch, training=False)
        out2 = model.apply(params, batch, training=False)
        np.testing.assert_array_equal(np.asarray(out1.design_out.idx),
                                      np.asarray(out2.design_out.idx))
        zt = np.asarray(out1.design_out.zt)
        np.testing.assert_array_equal(np.asarray(out1.design_out.idx),
                                      zt.argmax(-1))
        np.testing.assert_allclose(
            np.asarray(out1.design_out.log_prob),
            np.log(zt.max(-1)), rtol=1e-5)

    def test_log_prob_matches_categorical(self, rng_key):
        cfg = small_cfg()
        model = build_model(cfg)
        batch = make_batch(cfg, rng_key)
        params = model.init(rng_key, batch, training=False)
        out = model.apply(params, batch, training=True, rng=rng_key)
        zt = np.asarray(out.design_out.zt)
        idx = np.asarray(out.design_out.idx)
        ref = np.log(zt[np.arange(3), idx])
        np.testing.assert_allclose(np.asarray(out.design_out.log_prob), ref,
                                   rtol=1e-5)

    def test_value_head(self, rng_key):
        cfg = small_cfg()
        cfg.head.value_head = True
        model = build_model(cfg)
        batch = make_batch(cfg, rng_key)
        params = model.init(rng_key, batch, training=False)
        out = model.apply(params, batch, training=False)
        assert out.value.shape == (3,)

    def test_time_token_variants(self, rng_key):
        for field, val in (("time_token", True),
                           (("encoder", "with_time_token"), True)):
            cfg = small_cfg()
            if isinstance(field, tuple):
                setattr(cfg.encoder, field[1], val)
            else:
                setattr(cfg, field, val)
            model = build_model(cfg)
            batch = make_batch(cfg, rng_key)
            batch = batch.replace(t=jnp.asarray(0.5, jnp.float32))
            params = model.init(rng_key, batch, training=False)
            out = model.apply(params, batch, training=False)
            assert out.design_out.idx.shape == (3,)

    def test_theta_and_data_modes(self, rng_key):
        for mode, kw in (("theta", dict(embedding_type="theta",
                                        n_target_data=0)),
                         ("data", dict(embedding_type="data",
                                       n_target_theta=0))):
            cfg = small_cfg(**kw)
            model = build_model(cfg)
            batch = make_batch(cfg, rng_key)
            params = model.init(rng_key, batch, training=False)
            out = model.apply(params, batch, training=False)
            n_t = 2 if mode == "theta" else 4
            assert out.posterior_out.mixture_means.shape[1] == n_t

    def test_continuous_head(self, rng_key):
        cfg = small_cfg()
        cfg.head.continuous = True
        cfg.embedder.continuous = True
        model = build_model(cfg)
        batch = make_batch(cfg, rng_key)
        params = model.init(rng_key, batch, training=False)
        out = model.apply(params, batch, training=True, rng=rng_key)
        assert out.design_out.xi.shape == (3, 1, 1)
        assert out.design_out.log_prob.shape == (3,)
        assert (np.asarray(out.design_out.std) > 0).all()
        # eval: xi == mean
        out_e = model.apply(params, batch, training=False)
        np.testing.assert_array_equal(np.asarray(out_e.design_out.xi),
                                      np.asarray(out_e.design_out.mean))

    def test_predictor_params_identifiable(self, rng_key):
        """Layerwise-LR partition needs 'predictor' in policy-MLP paths
        (reference: utils/misc.py:153-167)."""
        cfg = small_cfg()
        model = build_model(cfg)
        batch = make_batch(cfg, rng_key)
        params = model.init(rng_key, batch, training=False)
        flat = jax.tree_util.tree_leaves_with_path(params)
        paths = ["/".join(str(p) for p in path) for path, _ in flat]
        pred = [p for p in paths if "predictor" in p]
        nonpred = [p for p in paths if "predictor" not in p]
        assert len(pred) == 4       # acquisition fc1/fc2 kernel+bias
        assert any("target_head" in p for p in nonpred)
        assert any("x_embedder" in p for p in nonpred)


class TestGMMHead:
    def test_components_are_independent(self, rng_key):
        head = GMMTargetHead(dim_y=1, dim_embedding=8, dim_feedforward=16,
                             num_components=3)
        z = jnp.ones((2, 5, 8))
        params = head.init(rng_key, z)
        out = head.apply(params, z)
        # Perturb only component 0's parameters; other components unchanged.
        p2 = jax.tree_util.tree_map(lambda x: x, params)
        w1 = p2["params"]["heads_w1"]
        p2["params"]["heads_w1"] = w1.at[0].add(1.0)
        out2 = head.apply(p2, z)
        m1, m2 = (np.asarray(out.mixture_means),
                  np.asarray(out2.mixture_means))
        assert not np.allclose(m1[..., 0], m2[..., 0])
        np.testing.assert_array_equal(m1[..., 1:], m2[..., 1:])

    def test_single_head_variant(self, rng_key):
        head = GMMTargetHead(dim_y=1, dim_embedding=8, dim_feedforward=16,
                             num_components=4, single_head=True)
        z = jnp.ones((2, 5, 8))
        params = head.init(rng_key, z)
        out = head.apply(params, z)
        assert out.mixture_means.shape == (2, 5, 4)
        np.testing.assert_allclose(
            np.asarray(out.mixture_weights).sum(-1), 1.0, rtol=1e-5)

    def test_multi_output_unsupported(self, rng_key):
        head = GMMTargetHead(dim_y=2, dim_embedding=8, dim_feedforward=16,
                             num_components=2)
        with pytest.raises(NotImplementedError):
            head.init(rng_key, jnp.ones((1, 2, 8)))


class TestCompactAttention:
    """The compact-key attention path must be EXACTLY equivalent to the
    dense biased path (same softmax over non-masked columns)."""

    def _outputs(self, cfg, rng_key, capacity):
        from aline_tpu.tasks import GPTask
        model = build_model(cfg)
        task = GPTask(cfg.task)
        batch = task.sample_batch(rng_key, 4)
        params = model.init(rng_key, batch, training=False)
        # consume two points so the context is non-trivial and scattered
        batch, _, _ = select_design(batch, jnp.array([3, 5, 7, 2]))
        batch, _, _ = select_design(batch, jnp.array([6, 2, 3, 9]))
        batch = batch.replace(ctx_capacity=capacity)
        out = model.apply(params, batch, training=False)
        return out

    def test_matches_dense(self, rng_key):
        cfg = small_cfg()
        cfg.encoder.attention_impl = "naive"
        dense = self._outputs(cfg, rng_key, 0)
        cfg2 = small_cfg()
        cfg2.encoder.attention_impl = "compact"
        comp = self._outputs(cfg2, rng_key, 6)
        np.testing.assert_allclose(
            np.asarray(dense.posterior_out.mixture_means),
            np.asarray(comp.posterior_out.mixture_means),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(dense.design_out.zt),
            np.asarray(comp.design_out.zt), rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(
            np.asarray(dense.design_out.idx), np.asarray(comp.design_out.idx))

    def test_matches_dense_with_target_mask(self, rng_key):
        cfg = small_cfg()
        cfg.encoder.attention_impl = "naive"
        from aline_tpu.tasks import GPTask
        model = build_model(cfg)
        task = GPTask(cfg.task)
        batch = task.sample_batch(rng_key, 3)
        params = model.init(rng_key, batch, training=False)
        tmask = jnp.array([True, False, True, False, False, True])
        batch = batch.replace(target_mask=tmask)
        dense = model.apply(params, batch, training=False)
        comp = model.apply(params, batch.replace(ctx_capacity=4),
                           training=False)
        np.testing.assert_allclose(
            np.asarray(dense.posterior_out_query.mixture_means),
            np.asarray(comp.posterior_out_query.mixture_means),
            rtol=2e-5, atol=2e-5)

    def test_matches_dense_time_token(self, rng_key):
        cfg = small_cfg()
        cfg.encoder.with_time_token = True
        from aline_tpu.tasks import GPTask
        model = build_model(cfg)
        task = GPTask(cfg.task)
        batch = task.sample_batch(rng_key, 3)
        batch = batch.replace(t=jnp.asarray(0.7, jnp.float32))
        params = model.init(rng_key, batch, training=False)
        dense = model.apply(params, batch, training=False)
        comp = model.apply(params, batch.replace(ctx_capacity=3),
                           training=False)
        np.testing.assert_allclose(
            np.asarray(dense.posterior_out.mixture_means),
            np.asarray(comp.posterior_out.mixture_means),
            rtol=2e-5, atol=2e-5)

    def test_rollout_compact_equals_dense(self, rng_key):
        """Greedy rollouts must choose identical designs under both paths."""
        from aline_tpu.ops.target_mask import target_weight_vectors
        from aline_tpu.train.rollout import rollout
        from aline_tpu.tasks import GPTask
        cfg = small_cfg()
        model = build_model(cfg)
        task = GPTask(cfg.task)
        batch = task.sample_batch(rng_key, 4)
        params = model.init(rng_key, batch, training=False)
        w_q, w_p = target_weight_vectors(np.ones(6, bool), "mix", "all", 4, 2)
        ro_d = rollout(model, params, batch, 4, jnp.asarray(w_q),
                       jnp.asarray(w_p), rng_key, training=False)
        ro_c = rollout(model, params, batch.replace(ctx_capacity=6), 4,
                       jnp.asarray(w_q), jnp.asarray(w_p), rng_key,
                       training=False)
        np.testing.assert_array_equal(np.asarray(ro_d.idx),
                                      np.asarray(ro_c.idx))
        np.testing.assert_allclose(np.asarray(ro_d.nll_pred),
                                   np.asarray(ro_c.nll_pred),
                                   rtol=1e-4, atol=1e-5)


class TestBF16:
    def test_bf16_forward_close_to_f32(self, rng_key):
        from aline_tpu.tasks import GPTask
        cfg = small_cfg()
        model32 = build_model(cfg)
        task = GPTask(cfg.task)
        batch = task.sample_batch(rng_key, 4)
        params = model32.init(rng_key, batch, training=False)
        out32 = model32.apply(params, batch, training=False)
        cfg16 = small_cfg()
        cfg16.dtype = "bfloat16"
        model16 = build_model(cfg16)
        out16 = model16.apply(params, batch, training=False)
        # head outputs are f32 dtypes in both cases
        assert out16.posterior_out.mixture_means.dtype == jnp.float32
        assert out16.design_out.log_prob.dtype == jnp.float32
        # values agree to bf16 precision
        np.testing.assert_allclose(
            np.asarray(out16.posterior_out.mixture_means),
            np.asarray(out32.posterior_out.mixture_means),
            rtol=0.1, atol=0.1)
        # params remain f32 (param_dtype default)
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype == jnp.float32

    @pytest.mark.slow
    def test_bf16_training_step_finite(self, rng_key):
        from aline_tpu.ops.target_mask import target_weight_vectors
        from aline_tpu.tasks import GPTask
        from aline_tpu.train.rollout import rollout
        from aline_tpu.train.loss import total_loss
        cfg = small_cfg()
        cfg.dtype = "bfloat16"
        model = build_model(cfg)
        task = GPTask(cfg.task)
        batch = task.sample_batch(rng_key, 4)
        params = model.init(rng_key, batch, training=False)
        w_q, w_p = target_weight_vectors(np.ones(6, bool), "mix", "all", 4, 2)

        def loss_fn(p):
            ro = rollout(model, p, batch, 3, jnp.asarray(w_q),
                         jnp.asarray(w_p), rng_key, training=True)
            loss, _ = total_loss(ro, 1.0, jnp.asarray(1.0))
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
            assert leaf.dtype == jnp.float32
