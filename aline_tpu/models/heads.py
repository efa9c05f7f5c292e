"""Output heads: acquisition policy, GMM posterior, value critic.

Capability parity with the reference head stack (reference: model/head.py).
Module names deliberately contain ``predictor`` for the policy/value MLPs —
the burning-phase layerwise learning rate partitions parameters on that
substring exactly like the reference (reference: utils/misc.py:153-167).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from aline_tpu.ops.roles import NEG_INF
from aline_tpu.tasks.base import Batch


@flax.struct.dataclass
class GMMParams:
    """Posterior mixture parameters, each [B, n_tokens, C]."""
    mixture_means: jnp.ndarray
    mixture_stds: jnp.ndarray
    mixture_weights: jnp.ndarray


@flax.struct.dataclass
class DesignOut:
    """Discrete design decision (reference: model/head.py:376-391)."""
    idx: jnp.ndarray        # [B] chosen point index
    log_prob: jnp.ndarray   # [B] log prob of the choice
    zt: jnp.ndarray         # [B, n_points] selection probabilities (0 off-pool)


@flax.struct.dataclass
class ContinuousDesignOut:
    """Gaussian-policy design (reference: model/head.py:485-494)."""
    xi: jnp.ndarray         # [B, 1, dim_x]
    log_prob: jnp.ndarray   # [B]
    mean: jnp.ndarray       # [B, 1, dim_x]
    std: jnp.ndarray        # [B, 1, dim_x]


@flax.struct.dataclass
class AlineOutput:
    design_out: Any
    posterior_out: GMMParams
    posterior_out_query: GMMParams
    value: Optional[jnp.ndarray] = None


class AcquisitionHead(nn.Module):
    """Per-candidate design scores (reference: model/head.py:9-44).

    Returns RAW scores (f32); pool masking + softmax happen in the output
    head so consumed/context candidates are excluded exactly like the
    reference's softmax over the shrinking query pool.
    """
    dim_feedforward: int
    time_token: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_query: jnp.ndarray,
                 t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.time_token:
            B, N, _ = z_query.shape
            t_feat = jnp.broadcast_to(
                jnp.reshape(t, (1, 1, 1)).astype(z_query.dtype), (B, N, 1))
            z_query = jnp.concatenate([z_query, t_feat], axis=-1)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     name="predictor_fc1")(z_query)
        s = nn.Dense(1, dtype=self.dtype,
                     name="predictor_fc2")(nn.relu(h))
        return s[..., 0].astype(jnp.float32)                 # [B, n_points]


class ContinuousAcquisitionHead(nn.Module):
    """Gaussian design policy (reference: model/head.py:47-81)."""
    dim_feedforward: int
    dim_x: int
    time_token: bool = False
    log_std_min: float = -20.0
    log_std_max: float = 2.0

    @nn.compact
    def __call__(self, z: jnp.ndarray, t: Optional[jnp.ndarray] = None):
        if self.time_token:
            B, N, _ = z.shape
            t_feat = jnp.broadcast_to(
                jnp.reshape(t, (1, 1, 1)).astype(z.dtype), (B, N, 1))
            z = jnp.concatenate([z, t_feat], axis=-1)
        h_m = nn.Dense(self.dim_feedforward, name="mean_predictor_fc1")(z)
        mean = nn.Dense(self.dim_x, name="mean_predictor_fc2")(nn.relu(h_m))
        h_s = nn.Dense(self.dim_feedforward, name="log_std_predictor_fc1")(z)
        log_std = nn.Dense(self.dim_x,
                           name="log_std_predictor_fc2")(nn.relu(h_s))
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mean, jnp.exp(log_std)


class ValueHead(nn.Module):
    """Critic over context tokens (reference: model/head.py:84-111)."""
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_points: jnp.ndarray,
                 ctx_mask: jnp.ndarray) -> jnp.ndarray:
        empty_value = self.param("empty_value", nn.initializers.zeros, (1,))
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     name="predictor_fc1")(z_points)
        v = nn.Dense(1, dtype=self.dtype,
                     name="predictor_fc2")(nn.relu(h))[..., 0]
        v = v.astype(jnp.float32)                            # [B, P]
        w = ctx_mask.astype(v.dtype)
        count = jnp.sum(w, axis=1)
        mean_v = jnp.sum(v * w, axis=1) / jnp.maximum(count, 1.0)
        # zero-context batches fall back to the learned empty value
        return jnp.where(count > 0, mean_v, empty_value[0])


class GMMTargetHead(nn.Module):
    """Amortized posterior head (reference: model/head.py:115-266).

    ``num_components`` INDEPENDENT 2-layer MLPs each emit
    (mean, raw_std, raw_weight) per token; implemented as one einsum over a
    stacked [C, ...] parameter axis instead of a Python list of modules.

    ``single_head=True`` implements the *intended* single-MLP variant
    (one MLP emitting 3·C outputs).  NOTE divergence from the reference:
    its ``single_head & num_components > 1`` parses as
    ``(single_head & num_components) > 1`` (reference :208), making
    single_head with >1 components emit a 2-chunk output that forward then
    3-chunks — broken; only the multi-head default is sound there.
    """
    dim_y: int
    dim_embedding: int
    dim_feedforward: int
    num_components: int
    single_head: bool = False
    std_min: float = 1e-4
    dtype: jnp.dtype = jnp.float32
    # None → fused Pallas kernel on TPU, XLA einsum elsewhere;
    # True/False force the choice (see ops/gmm_head_kernel.py)
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> GMMParams:
        if self.dim_y != 1:
            raise NotImplementedError(
                "GMM head supports scalar targets (reference model/head.py "
                "TODO at :150: 'support multi-output case')")
        C = self.num_components
        if self.single_head:
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name="fc1")(z)
            out = nn.Dense(3 * C, dtype=self.dtype, name="fc2")(nn.relu(h))
            out = out.astype(jnp.float32).reshape(z.shape[:-1] + (3, C))
            raw_mean, raw_std, raw_w = out[..., 0, :], out[..., 1, :], \
                out[..., 2, :]
        else:
            D, F = self.dim_embedding, self.dim_feedforward
            w1 = self.param("heads_w1", nn.initializers.lecun_normal(),
                            (C, D, F))
            b1 = self.param("heads_b1", nn.initializers.zeros, (C, F))
            w2 = self.param("heads_w2", nn.initializers.lecun_normal(),
                            (C, F, 3))
            b2 = self.param("heads_b2", nn.initializers.zeros, (C, 3))
            backend = jax.default_backend()
            # auto: the Pallas kernel wins at long token counts (it keeps
            # the [tile, C, F] hidden block in VMEM); XLA's fused einsum
            # wins inside the short-T rollout steps (measured on v5e —
            # docs/PERFORMANCE.md)
            use_fused = (self.fused if self.fused is not None
                         else backend == "tpu" and z.shape[1] >= 1024)
            if use_fused:
                from aline_tpu.ops.gmm_head_kernel import fused_gmm_head
                out = fused_gmm_head(z.astype(jnp.float32), w1, b1, w2, b2,
                                     backend != "tpu")       # [B, T, C, 3]
            else:
                cd = self.dtype
                h = nn.relu(jnp.einsum("btd,cdf->btcf", z.astype(cd),
                                       w1.astype(cd)) + b1.astype(cd))
                out = jnp.einsum("btcf,cfo->btco",
                                 h, w2.astype(cd)).astype(
                    jnp.float32) + b2                        # [B, T, C, 3]
            raw_mean, raw_std, raw_w = (out[..., 0], out[..., 1],
                                        out[..., 2])
        std = nn.softplus(raw_std) + self.std_min
        weights = nn.softmax(raw_w, axis=-1)
        return GMMParams(raw_mean, std, weights)


class OutputHead(nn.Module):
    """Combined head (reference: model/head.py:270-393)."""
    dim_x: int
    dim_y: int
    dim_embedding: int
    dim_feedforward: int
    num_components: int = 10
    single_head: bool = False
    std_min: float = 1e-4
    value_head: bool = False
    time_token: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_gmm: Optional[bool] = None

    def setup(self):
        self.acquisition_head = AcquisitionHead(
            self.dim_feedforward, self.time_token, self.dtype,
            name="acquisition_head")
        self.target_head = GMMTargetHead(
            self.dim_y, self.dim_embedding, self.dim_feedforward,
            self.num_components, self.single_head, self.std_min,
            self.dtype, self.fused_gmm, name="target_head")
        if self.value_head:
            self.value_module = ValueHead(self.dim_feedforward, self.dtype,
                                          name="value_head")

    def __call__(self, batch: Batch, z: jnp.ndarray, *, training: bool,
                 rng: Optional[jax.Array] = None,
                 time_offset: int = 0) -> AlineOutput:
        """Split encoder output into point/target segments, select a design,
        predict posteriors.

        Args:
            z: [B, time? + n_points + n_target, D] encoder output.
            time_offset: 1 when a global time token is prepended.
        """
        n_points = batch.n_points
        z_points = z[:, time_offset: time_offset + n_points]
        z_target = z[:, time_offset + n_points:]

        scores = self.acquisition_head(z_points, batch.t)    # [B, P] raw
        pool = batch.query_mask
        logits = jnp.where(pool, scores, NEG_INF)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        if training:
            idx = jax.random.categorical(rng, logits, axis=-1)   # [B]
        else:
            idx = jnp.argmax(log_probs, axis=-1)
        b = jnp.arange(z.shape[0])
        log_prob = log_probs[b, idx]
        zt = jnp.where(pool, jnp.exp(log_probs), 0.0)

        posterior_out = self.target_head(z_target)
        posterior_out_query = self.target_head(z_points)

        value = None
        if self.value_head:
            value = self.value_module(z_points, batch.ctx_mask)

        return AlineOutput(
            design_out=DesignOut(idx=idx, log_prob=log_prob, zt=zt),
            posterior_out=posterior_out,
            posterior_out_query=posterior_out_query,
            value=value)


class ContinuousOutputHead(nn.Module):
    """Gaussian-policy head for continuous designs
    (reference: model/head.py:396-495).  Reads the dedicated query slot
    (the last point slot by convention of the continuous batch layout)."""
    dim_x: int
    dim_y: int
    dim_embedding: int
    dim_feedforward: int
    num_components: int = 10
    single_head: bool = False
    std_min: float = 1e-4
    time_token: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_gmm: Optional[bool] = None
    policy_log_std_min: float = -20.0
    policy_log_std_max: float = 2.0

    def setup(self):
        self.acquisition_head = ContinuousAcquisitionHead(
            self.dim_feedforward, self.dim_x, self.time_token,
            self.policy_log_std_min, self.policy_log_std_max,
            name="acquisition_head")
        self.target_head = GMMTargetHead(
            self.dim_y, self.dim_embedding, self.dim_feedforward,
            self.num_components, self.single_head, self.std_min,
            self.dtype, self.fused_gmm, name="target_head")

    def __call__(self, batch: Batch, z: jnp.ndarray, *, training: bool,
                 rng: Optional[jax.Array] = None,
                 time_offset: int = 0) -> AlineOutput:
        n_points = batch.n_points
        z_points = z[:, time_offset: time_offset + n_points]
        z_target = z[:, time_offset + n_points:]
        z_query = z_points[:, -1:]                           # query slot

        mean, std = self.acquisition_head(z_query, batch.t)  # [B, 1, dim_x]
        if training:
            eps = jax.random.normal(rng, mean.shape, mean.dtype)
            xi = mean + std * eps
        else:
            xi = mean
        # Gaussian log prob summed over design dims (reference :477-478)
        z_norm = (xi - mean) / std
        lp = (-0.5 * z_norm ** 2 - jnp.log(std)
              - 0.5 * jnp.log(2.0 * jnp.pi))
        log_prob = lp.sum(-1)[:, 0]                          # [B]

        return AlineOutput(
            design_out=ContinuousDesignOut(xi=xi, log_prob=log_prob,
                                           mean=mean, std=std),
            posterior_out=self.target_head(z_target),
            posterior_out_query=self.target_head(z_query),
            value=None)
