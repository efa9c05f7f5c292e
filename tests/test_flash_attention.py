"""Pallas flash-attention kernel equivalence tests (interpret mode on CPU),
mirroring the reference's encoder-equivalence methodology
(reference: model/encoder.py:227-342)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.models import build_model
from aline_tpu.ops.attention import dense_bias_attention
from aline_tpu.ops.flash_attention import flash_role_attention, roles_to_codes
from aline_tpu.ops.roles import attention_bias, build_roles
from aline_tpu.tasks import GPTask


def make_roles(np_rng, B=2, n_points=12, n_target=5, with_time=False):
    ctx = np_rng.uniform(size=(B, n_points)) < 0.4
    ctx[:, 0] = True  # ensure every row has something to attend
    tmask = np_rng.uniform(size=(n_target,)) < 0.5
    return build_roles(jnp.asarray(ctx), n_target, jnp.asarray(tmask),
                       with_time), ctx, tmask


class TestFlashKernel:
    def _qkv(self, np_rng, B, H, N, dh):
        mk = lambda: jnp.asarray(
            np_rng.normal(size=(B, H, N, dh)), jnp.float32)
        return mk(), mk(), mk()

    @pytest.mark.parametrize("with_time", [False, True])
    def test_forward_matches_dense(self, np_rng, with_time):
        B, H, n_points, n_target, dh = 2, 4, 12, 5, 8
        roles, _, _ = make_roles(np_rng, B, n_points, n_target, with_time)
        N = n_points + n_target + int(with_time)
        q, k, v = self._qkv(np_rng, B, H, N, dh)
        bias = attention_bias(roles)
        ref = dense_bias_attention(q, k, v, bias)
        kcode, qrow = roles_to_codes(roles)
        got = flash_role_attention(q, k, v, kcode, qrow, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_forward_nonaligned_sizes(self, np_rng):
        """N not a multiple of the q block: padding must be inert."""
        B, H, N, dh = 1, 2, 37, 16
        roles, _, _ = make_roles(np_rng, B, 30, 7)
        q, k, v = self._qkv(np_rng, B, H, N, dh)
        bias = attention_bias(roles)
        ref = dense_bias_attention(q, k, v, bias)
        kcode, qrow = roles_to_codes(roles)
        got = flash_role_attention(q, k, v, kcode, qrow, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_dense(self, np_rng):
        B, H, n_points, n_target, dh = 2, 2, 10, 4, 8
        roles, _, _ = make_roles(np_rng, B, n_points, n_target)
        N = n_points + n_target
        q, k, v = self._qkv(np_rng, B, H, N, dh)
        bias = attention_bias(roles)
        kcode, qrow = roles_to_codes(roles)
        w = jnp.asarray(np_rng.normal(size=(B, H, N, dh)), jnp.float32)

        def loss_dense(q, k, v):
            return jnp.sum(dense_bias_attention(q, k, v, bias) * w)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_role_attention(q, k, v, kcode, qrow, True) * w)

        g_ref = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_got, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=f"d{name} mismatch")

    @pytest.mark.slow
    def test_model_forward_with_flash_impl(self, rng_key):
        """Full model forward under attention_impl=flash equals naive."""
        cfg = parse_overrides(["task=al_mix", "task.dim_x=1",
                               "task.n_target_theta=2",
                               "task.n_context_init=2",
                               "task.n_query_init=8",
                               "task.n_target_data=4"])
        task = GPTask(cfg.task)
        batch = task.sample_batch(rng_key, 3)
        model_naive = build_model(cfg)
        params = model_naive.init(rng_key, batch, training=False)
        out_naive = model_naive.apply(params, batch, training=False)
        cfg.encoder.attention_impl = "flash"
        model_flash = build_model(cfg)
        out_flash = model_flash.apply(params, batch, training=False)
        np.testing.assert_allclose(
            np.asarray(out_naive.posterior_out.mixture_means),
            np.asarray(out_flash.posterior_out.mixture_means),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out_naive.design_out.idx),
            np.asarray(out_flash.design_out.idx))
