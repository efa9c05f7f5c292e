"""Gaussian-process prior sampler for amortized active learning.

TPU-first redesign of the reference ``GPTask``
(reference: tasks/gaussian_process.py:8-542).  The reference draws each
batch element's GP with a *Python loop* over per-element Cholesky
factorizations (reference :366-417, the sampling hot spot).  Here the whole
batch is one batched covariance build + one batched
``jnp.linalg.cholesky`` — the per-element heterogeneous kernel *type* is
handled by computing all four kernels from one shared distance matrix and
one-hot selecting (SURVEY.md §7 hard-part 6: cheaper than lax.switch under
vmap, which computes all branches anyway).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aline_tpu.ops.sobol import sample_sobol
from aline_tpu.tasks.base import Batch, Task

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)

KERNEL_TYPES = ("rbf", "matern12", "matern32", "matern52")


def scaled_sq_dists(x1: jnp.ndarray, x2: jnp.ndarray,
                    lengthscales: jnp.ndarray) -> jnp.ndarray:
    """Pairwise lengthscale-weighted squared distances.

    Args:
        x1: [..., N, D], x2: [..., M, D], lengthscales: [..., D]
    Returns:
        [..., N, M]
    """
    d = (x1[..., :, None, :] - x2[..., None, :, :]) / lengthscales[..., None, None, :]
    return jnp.sum(d * d, axis=-1)


def kernel_stack(sq_dist: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """All four covariance kernels from one distance matrix.

    Matches the reference kernel formulas
    (reference: tasks/gaussian_process.py:193-317).

    Args:
        sq_dist: [..., N, M] lengthscale-weighted squared distances.
        scale:   [...] output variance.
    Returns:
        [4, ..., N, M] stacked (rbf, matern12, matern32, matern52).
    """
    r = jnp.sqrt(jnp.maximum(sq_dist, 0.0))
    s = scale[..., None, None]
    rbf = s * jnp.exp(-0.5 * sq_dist)
    m12 = s * jnp.exp(-r)
    m32 = s * (1.0 + _SQRT3 * r) * jnp.exp(-_SQRT3 * r)
    m52 = s * (1.0 + _SQRT5 * r + (5.0 / 3.0) * sq_dist) * jnp.exp(-_SQRT5 * r)
    return jnp.stack([rbf, m12, m32, m52], axis=0)


class GPTask(Task):
    """GP active-learning simulator (reference: tasks/gaussian_process.py).

    theta = [per-dim lengthscales (isotropic with prob p_iso), output scale],
    stored as [B, dim_x + 1, 1].
    """

    def __init__(self, cfg):
        super().__init__(cfg)
        self.jitter = 1e-5
        self.p_iso = cfg.p_iso
        self.kernel_weights = jnp.asarray(
            cfg.kernel_weights if cfg.kernel_weights is not None
            else [1.0 / 3.0, 0.0, 1.0 / 3.0, 1.0 / 3.0], jnp.float32)
        self.noise_scale = cfg.noise_scale
        self.data_gen = getattr(cfg, "data_gen", "uniform")
        if self.data_gen not in ("uniform", "sobol", "lattice"):
            raise ValueError(f"unknown data_gen {self.data_gen!r}")

        if self.embedding_type in ("mix", "theta"):
            if cfg.n_target_theta != self.dim_x + 1:
                raise ValueError(
                    "n_target_theta must equal dim_x + 1 for theta/mix "
                    "embedding (reference: tasks/gaussian_process.py:63-65)")

        # Lengthscale prior bounds scaled by sqrt(dim_x)
        # (reference :69-73).
        base = math.sqrt(self.dim_x)
        self.lengthscale_lower = cfg.lengthscale_lower * base
        self.lengthscale_upper = cfg.lengthscale_upper * base
        self.scale_lower, self.scale_upper = 0.1, 1.0

    # -- priors ------------------------------------------------------------
    def sample_theta(self, key: jax.Array,
                     shape: Tuple[int, ...]) -> jnp.ndarray:
        """Sample [*, dim_x+1, 1] hyperparameters (reference :83-105)."""
        k_ls, k_iso, k_scale = jax.random.split(key, 3)
        ls = jax.random.uniform(
            k_ls, tuple(shape) + (self.dim_x,),
            minval=self.lengthscale_lower, maxval=self.lengthscale_upper)
        is_iso = jax.random.bernoulli(k_iso, self.p_iso, tuple(shape))
        ls = jnp.where(is_iso[..., None], ls[..., :1], ls)
        scale = jax.random.uniform(
            k_scale, tuple(shape), minval=self.scale_lower,
            maxval=self.scale_upper)
        theta = jnp.concatenate([ls, scale[..., None]], axis=-1)
        return theta[..., None]  # [*, dim_x+1, 1]

    def sample_data(self, key: jax.Array, batch_size: int,
                    n_data: int) -> jnp.ndarray:
        """Uniform design draws in [-design_scale, design_scale]^D
        (reference :107-120)."""
        return jax.random.uniform(
            key, (batch_size, n_data, self.dim_x),
            minval=-self.design_scale, maxval=self.design_scale)

    def sample_data_sobol(self, key: jax.Array, batch_size: int,
                          n_data: int) -> jnp.ndarray:
        """Scrambled Sobol designs (reference :123-165), pure-JAX
        (jit/vmap-safe): digitally-shifted Joe-Kuo Sobol points with the
        reference's per-dimension random permutations, mapped to
        [-design_scale, design_scale]^D."""
        pts = sample_sobol(key, batch_size, n_data, self.dim_x)
        return pts * 2.0 * self.design_scale - self.design_scale

    def sample_data_lattice(self, key: jax.Array, batch_size: int,
                            n_data: int) -> jnp.ndarray:
        """Randomized rank-1 Kronecker (R_d) lattice designs: per-batch
        random-shift lattice points with per-dimension random
        permutations — a cheaper low-discrepancy alternative to Sobol
        with the same uniformity property."""
        k_shift, k_perm = jax.random.split(key)
        # R_d Kronecker sequence generator vector (generalized golden
        # ratio g: g^(d+1) = g + 1), the standard low-discrepancy choice
        g = 1.0
        for _ in range(64):
            g = (1.0 + g) ** (1.0 / (self.dim_x + 1))
        alphas = jnp.array(
            [((1.0 / g) ** (d + 1)) % 1.0 for d in range(self.dim_x)],
            jnp.float32)
        i = jnp.arange(n_data, dtype=jnp.float32)[:, None]
        base = (i * alphas[None, :]) % 1.0                    # [N, D]
        shift = jax.random.uniform(k_shift, (batch_size, 1, self.dim_x))
        pts = (base[None] + shift) % 1.0                      # [B, N, D]
        # independent per-batch per-dim permutations decorrelate dimensions
        perm_keys = jax.random.split(k_perm, batch_size * self.dim_x)
        perms = jnp.stack([jax.random.permutation(k, n_data)
                           for k in perm_keys]).reshape(
            batch_size, self.dim_x, n_data)
        pts = jnp.stack(
            [jnp.take_along_axis(pts[..., d], perms[:, d], axis=1)
             for d in range(self.dim_x)], axis=-1)
        return pts * 2.0 * self.design_scale - self.design_scale

    # -- GP sampling -------------------------------------------------------
    def _covariance(self, x: jnp.ndarray, theta: jnp.ndarray,
                    kernel_idx: jnp.ndarray) -> jnp.ndarray:
        """Batched covariance with per-element kernel type.

        x: [B, N, D]; theta: [B, D+1, 1]; kernel_idx: [B] int.
        Returns [B, N, N].
        """
        ls = theta[:, : self.dim_x, 0]                      # [B, D]
        scale = theta[:, self.dim_x, 0]                     # [B]
        d2 = scaled_sq_dists(x, x, ls)                      # [B, N, N]
        ks = kernel_stack(d2, scale)                        # [4, B, N, N]
        onehot = jax.nn.one_hot(kernel_idx, 4, dtype=x.dtype)  # [B, 4]
        return jnp.einsum("kbnm,bk->bnm", ks, onehot)

    def generate_gp_data(self, key: jax.Array, x: jnp.ndarray,
                         theta: jnp.ndarray) -> jnp.ndarray:
        """Draw correlated GP outcomes for all points of every batch element
        in one batched Cholesky (replaces the per-element loop at
        reference :366-417).

        Returns noisy observations [B, N, 1].
        """
        B, N, _ = x.shape
        k_kernel, k_f, k_noise = jax.random.split(key, 3)
        kernel_idx = jax.random.categorical(
            k_kernel, jnp.log(self.kernel_weights + 1e-38), shape=(B,))
        K = self._covariance(x, theta, kernel_idx)
        eye = jnp.eye(N, dtype=x.dtype)
        L = jnp.linalg.cholesky(K + self.jitter * eye)
        # Fallback for numerically non-PSD draws: retry with a 100x jitter
        # (replaces the reference's MultivariateNormal exception path,
        # reference :401-412).  lax.cond executes the retry only when some
        # factorization actually produced NaNs, so the common path pays for
        # a single batched Cholesky.
        bad = jnp.isnan(L).any(axis=(-2, -1))                # [B]

        def _retry(_):
            L_safe = jnp.linalg.cholesky(K + (100.0 * self.jitter) * eye)
            return jnp.where(bad[:, None, None], L_safe, L)

        L = jax.lax.cond(bad.any(), _retry, lambda _: L, None)
        z = jax.random.normal(k_f, (B, N, 1), dtype=x.dtype)
        f = L @ z                                             # [B, N, 1]
        noise = self.noise_scale * jax.random.normal(k_noise, (B, N, 1),
                                                     dtype=x.dtype)
        return f + noise

    def simulate(self, key: jax.Array, x: jnp.ndarray,
                 theta: jnp.ndarray) -> jnp.ndarray:
        """Reference ``forward`` (tasks/gaussian_process.py:419-448):
        xi is normalized; convert to design space then draw."""
        x = self.to_design_space(x)
        single = x.ndim == 2
        if single:
            x = x[:, None, :]
        y = self.generate_gp_data(key, x, theta)
        return y[:, 0] if single else y

    # -- batch -------------------------------------------------------------
    def sample_batch(self, key: jax.Array, batch_size: int,
                     n_query: Optional[int] = None) -> Batch:
        """Joint GP draw over context ∪ query ∪ target points, split per
        embedding mode (reference :450-530)."""
        n_query = self.n_query_init if n_query is None else n_query
        k_theta, k_x, k_y = jax.random.split(key, 3)
        theta = self.sample_theta(k_theta, (batch_size,))   # [B, D+1, 1]

        n_points = self.n_context_init + n_query
        n_total = n_points + self.n_target_data
        if self.data_gen == "sobol":
            x_all = self.sample_data_sobol(k_x, batch_size, n_total)
        elif self.data_gen == "lattice":
            x_all = self.sample_data_lattice(k_x, batch_size, n_total)
        else:
            x_all = self.sample_data(k_x, batch_size, n_total)
        y_all = self.generate_gp_data(k_y, x_all, theta)

        x, y = x_all[:, :n_points], y_all[:, :n_points]
        target_x = x_all[:, n_points:]
        target_y = y_all[:, n_points:]
        # theta token values [B, dim_x+1, 1]
        return self._pack_batch(x, y, target_x, target_y, theta, theta)
