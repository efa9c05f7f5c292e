"""Fused GMM-head Pallas kernel equivalence tests (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from aline_tpu.models.heads import GMMTargetHead
from aline_tpu.ops.gmm_head_kernel import fused_gmm_head


def _params(np_rng, C=4, D=16, F=32):
    w1 = jnp.asarray(np_rng.normal(size=(C, D, F)) * 0.2, jnp.float32)
    b1 = jnp.asarray(np_rng.normal(size=(C, F)) * 0.1, jnp.float32)
    w2 = jnp.asarray(np_rng.normal(size=(C, F, 3)) * 0.2, jnp.float32)
    b2 = jnp.asarray(np_rng.normal(size=(C, 3)) * 0.1, jnp.float32)
    return w1, b1, w2, b2


def _xla_reference(z, w1, b1, w2, b2):
    h = jax.nn.relu(jnp.einsum("btd,cdf->btcf", z, w1) + b1)
    return jnp.einsum("btcf,cfo->btco", h, w2) + b2


class TestFusedGMMHead:
    def test_forward_matches_xla(self, np_rng):
        z = jnp.asarray(np_rng.normal(size=(3, 11, 16)), jnp.float32)
        w1, b1, w2, b2 = _params(np_rng)
        ref = _xla_reference(z, w1, b1, w2, b2)
        got = fused_gmm_head(z, w1, b1, w2, b2, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_forward_nonaligned_T(self, np_rng):
        z = jnp.asarray(np_rng.normal(size=(2, 37, 16)), jnp.float32)
        w1, b1, w2, b2 = _params(np_rng)
        ref = _xla_reference(z, w1, b1, w2, b2)
        got = fused_gmm_head(z, w1, b1, w2, b2, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_xla(self, np_rng):
        z = jnp.asarray(np_rng.normal(size=(2, 9, 16)), jnp.float32)
        w1, b1, w2, b2 = _params(np_rng)
        g = jnp.asarray(np_rng.normal(size=(2, 9, 4, 3)), jnp.float32)

        def loss_ref(z, w1, b1, w2, b2):
            return jnp.sum(_xla_reference(z, w1, b1, w2, b2) * g)

        def loss_fused(z, w1, b1, w2, b2):
            return jnp.sum(fused_gmm_head(z, w1, b1, w2, b2, True) * g)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(z, w1, b1, w2,
                                                            b2)
        g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(z, w1, b1,
                                                              w2, b2)
        names = ["dz", "dw1", "db1", "dw2", "db2"]
        for a, b, n in zip(g_got, g_ref, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4, err_msg=n)

    def test_head_module_fused_matches_einsum(self, rng_key, np_rng):
        head_x = GMMTargetHead(dim_y=1, dim_embedding=16, dim_feedforward=32,
                               num_components=4, fused=False)
        z = jnp.asarray(np_rng.normal(size=(2, 7, 16)), jnp.float32)
        params = head_x.init(rng_key, z)
        out_x = head_x.apply(params, z)
        head_f = GMMTargetHead(dim_y=1, dim_embedding=16, dim_feedforward=32,
                               num_components=4, fused=True)
        out_f = head_f.apply(params, z)
        np.testing.assert_allclose(np.asarray(out_f.mixture_means),
                                   np.asarray(out_x.mixture_means),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_f.mixture_weights),
                                   np.asarray(out_x.mixture_weights),
                                   rtol=1e-5, atol=1e-5)
