"""Analytic benchmark functions for OOD evaluation of AL policies.

Capability parity with the reference ``BenchmarkTask``
(reference: tasks/al_benchmarks.py:7-371): ten standard test functions with
domain rescaling from the normalized design box and Gaussian observation
noise.  Eval-only (no theta / likelihood).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from aline_tpu.tasks.base import Batch, Task

_PI = math.pi
_E = math.e


def _forrester(x):
    """(reference :86-91) domain [0, 1]"""
    x = x[..., 0]
    return ((6 * x - 2) ** 2 * jnp.sin(12 * x - 4)) / 5


def _branin(x):
    """Picheny-rescaled Branin (reference :93-119) domain [0,1]^2"""
    x1p, x2p = 15.0 * x[..., 0], 15.0 * x[..., 1]
    b = 5.1 / (4.0 * _PI ** 2)
    c = 5.0 / _PI
    t = 1.0 / (8.0 * _PI)
    val = (x2p - b * x1p ** 2 + c * x1p - 6.0) ** 2 \
        + 10.0 * (1.0 - t) * jnp.cos(x1p) + 10.0
    return (val - 44.81) / 51.95


def _gramacy1d(x):
    """(reference :121-126) domain [0.5, 2.5]"""
    x = x[..., 0]
    return (jnp.sin(10 * _PI * x) / (2 * x) + (x - 1) ** 4) / 3


def _gramacy2d(x):
    """(reference :128-134) domain [-2, 6]^2"""
    x1, x2 = x[..., 0], x[..., 1]
    return x1 * jnp.exp(-x1 ** 2 - x2 ** 2)


def _higdon(x):
    """(reference :136-152) domain [0, 20], piecewise at x=10"""
    x = x[..., 0]
    low = jnp.sin(_PI * x / 5) + 0.2 * jnp.cos(4 * _PI * x / 5)
    high = x / 10 - 1
    return jnp.where(x < 10, low, high)


def _rosenbrock(x):
    """(reference :154-160) domain [-2, 2]^2"""
    x1, x2 = x[..., 0], x[..., 1]
    return 100 * (x2 - x1 ** 2) ** 2 + (x1 - 1) ** 2


def _ackley(x):
    """(reference :162-170) domain [-2, 2]^2 (scaled)"""
    x1, x2 = x[..., 0], x[..., 1]
    t1 = -20 * jnp.exp(-0.2 * jnp.sqrt(0.5 * (x1 ** 2 + x2 ** 2)))
    t2 = -jnp.exp(0.5 * (jnp.cos(2 * _PI * x1) + jnp.cos(2 * _PI * x2)))
    return (t1 + t2 + 20 + _E) / 5


def _three_hump_camel(x):
    """(reference :172-185) domain [-2, 2]^2"""
    x1, x2 = x[..., 0], x[..., 1]
    return 2 * x1 ** 2 - 1.05 * x1 ** 4 + x1 ** 6 / 6 + x1 * x2 + x2 ** 2


def _holder_table(x):
    """(reference :187-203) domain [-10, 10]^2, scaled by /10"""
    x1, x2 = x[..., 0], x[..., 1]
    t1 = jnp.sin(x1) * jnp.cos(x2)
    t2 = jnp.exp(jnp.abs(1 - jnp.sqrt(x1 ** 2 + x2 ** 2) / _PI))
    return -jnp.abs(t1 * t2) / 10


def _goldstein_price(x):
    """(reference :205-226) domain [-2, 2]^2, log-transformed"""
    x1, x2 = x[..., 0], x[..., 1]
    p1 = 1 + (x1 + x2 + 1) ** 2 * (19 - 14 * x1 + 3 * x1 ** 2
                                   - 14 * x2 + 6 * x1 * x2 + 3 * x2 ** 2)
    p2 = 30 + (2 * x1 - 3 * x2) ** 2 * (18 - 32 * x1 + 12 * x1 ** 2
                                        + 48 * x2 - 36 * x1 * x2
                                        + 27 * x2 ** 2)
    return (jnp.log(p1 * p2) - 6) / 4


BENCHMARKS = {
    "forrester": dict(dim=1, domain=(0.0, 1.0), func=_forrester),
    "branin": dict(dim=2, domain=[(0.0, 1.0), (0.0, 1.0)], func=_branin),
    "gramacy1d": dict(dim=1, domain=(0.5, 2.5), func=_gramacy1d),
    "gramacy2d": dict(dim=2, domain=[(-2.0, 6.0), (-2.0, 6.0)],
                      func=_gramacy2d),
    "higdon": dict(dim=1, domain=(0.0, 20.0), func=_higdon),
    "rosenbrock2d": dict(dim=2, domain=[(-2.0, 2.0), (-2.0, 2.0)],
                         func=_rosenbrock),
    "ackley2d": dict(dim=2, domain=[(-2.0, 2.0), (-2.0, 2.0)], func=_ackley),
    "three_hump_camel": dict(dim=2, domain=[(-2.0, 2.0), (-2.0, 2.0)],
                             func=_three_hump_camel),
    "holder_table": dict(dim=2, domain=[(-10.0, 10.0), (-10.0, 10.0)],
                         func=_holder_table),
    "goldstein_price": dict(dim=2, domain=[(-2.0, 2.0), (-2.0, 2.0)],
                            func=_goldstein_price),
}


class BenchmarkTask(Task):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.noise_scale = cfg.noise_scale
        self.benchmark_name = getattr(cfg, "benchmark_name", "forrester")

    def _scale_input_to_domain(self, x_norm: jnp.ndarray,
                               benchmark_name: str) -> jnp.ndarray:
        """Map [-design_scale, design_scale] to the function domain
        (reference :228-256)."""
        spec = BENCHMARKS[benchmark_name]
        domain = spec["domain"]
        if isinstance(domain, tuple):
            lo, hi = domain
            return (x_norm / self.design_scale) * ((hi - lo) / 2) \
                + (hi + lo) / 2
        cols = []
        for i, (lo, hi) in enumerate(domain):
            cols.append((x_norm[..., i] / self.design_scale)
                        * ((hi - lo) / 2) + (hi + lo) / 2)
        return jnp.stack(cols, axis=-1)

    def simulate(self, key: jax.Array, xi: jnp.ndarray,
                 benchmark_name: Optional[str] = None) -> jnp.ndarray:
        """Noisy function observation (reference ``forward`` :258-313)."""
        name = benchmark_name or self.benchmark_name
        spec = BENCHMARKS[name]
        if spec["dim"] != self.dim_x:
            raise ValueError(
                f"benchmark {name} requires dim {spec['dim']}, "
                f"task has dim_x={self.dim_x}")
        x = self._scale_input_to_domain(xi, name)
        single = x.ndim == 2
        if single:
            x = x[:, None, :]
        y = spec["func"](x)[..., None]                       # [B, N, 1]
        y = y + self.noise_scale * jax.random.normal(key, y.shape, y.dtype)
        return y[:, 0] if single else y

    def sample_data(self, key: jax.Array, batch_size: int,
                    n_data: int) -> jnp.ndarray:
        return jax.random.uniform(
            key, (batch_size, n_data, self.dim_x),
            minval=-self.design_scale, maxval=self.design_scale)

    def sample_batch(self, key: jax.Array, batch_size: int,
                     n_query: Optional[int] = None,
                     benchmark_name: Optional[str] = None,
                     mode: str = "data") -> Batch:
        """(reference :319-358)."""
        name = benchmark_name or self.benchmark_name
        n_query = self.n_query_init if n_query is None else n_query
        k_x, k_y = jax.random.split(key)
        n_points = self.n_context_init + n_query
        n_total = n_points + self.n_target_data
        x_all = self.sample_data(k_x, batch_size, n_total)
        y_all = self.simulate(k_y, x_all, name)
        x, y = x_all[:, :n_points], y_all[:, :n_points]
        target_x = x_all[:, n_points:]
        target_y = y_all[:, n_points:]
        if mode == "mix":
            theta_tokens = jnp.zeros((batch_size, self.dim_x + 1, 1))
            saved = self.embedding_type, self.n_target_theta
            self.embedding_type, self.n_target_theta = "mix", self.dim_x + 1
            try:
                return self._pack_batch(x, y, target_x, target_y,
                                        theta_tokens, theta_tokens)
            finally:
                self.embedding_type, self.n_target_theta = saved
        theta_tokens = jnp.zeros((batch_size, 0, 1))
        return self._pack_batch(x, y, target_x, target_y, theta_tokens, None)
