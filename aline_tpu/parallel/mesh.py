"""Device mesh and sharding helpers.

The reference has no distributed story at all (SURVEY.md §2.9/§5.8: single
``cfg.device``, no collectives).  This module is the new subsystem that
gives the framework its multi-chip scaling:

* axis ``data``        — data parallelism over the experiment batch B for
                         training (gradients psum over ICI via pjit), and
* axis ``contrastive`` — sharding of the L contrastive-sample axis of the
                         sPCE/sNMC evaluation (each chip accumulates partial
                         log-likelihood sums; combined with a max-shifted
                         logsumexp reduction — see
                         :mod:`aline_tpu.parallel.collectives`).

Everything degrades gracefully to a 1-device mesh so single-chip CPU tests
exercise the identical code path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_data: int = 0, axis_name: str = "data",
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 1-D mesh over local devices.

    Args:
        n_data: number of shards (0 → all available devices).
        axis_name: mesh axis name.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested {n_data} shards but only "
                         f"{len(devices)} devices are available")
    return Mesh(np.asarray(devices[:n_data]), (axis_name,))


def get_eval_mesh(n_data: int, n_contrastive: int,
                  devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D mesh for the final sPCE/sNMC evaluation: the outer-rollout
    batch shards over axis ``data`` while the L contrastive chunks shard
    over axis ``contrastive`` (SURVEY.md §5.8).  ``n_data * n_contrastive``
    devices are used."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_contrastive
    if need > len(devices):
        raise ValueError(f"requested {n_data}x{n_contrastive} mesh but only "
                         f"{len(devices)} devices are available")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_contrastive),
                ("data", "contrastive"))


def shard_batch_spec(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = "data"):
    """Place every array leaf with its leading axis sharded over the mesh.
    Rank-0 leaves (scalars) and leaves whose leading axis does not divide
    the mesh are replicated."""
    n = mesh.shape[axis_name]

    def _put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(_put, tree)


def shard_query_pool(batch, mesh: Mesh, axis_name: str = "seq"):
    """Shard the token (query-pool) axis of a Batch across the mesh
    (SURVEY.md §5.7: sequence sharding for n_query up to 2000 at eval).

    Every leaf whose second axis equals the candidate-pool length
    (``x``/``y``/``ctx_mask``/``ctx_idx``) is placed with
    ``P(None, axis_name)``; everything else is replicated.  The rollout
    is row-parallel under the ALINE mask (each token attends only to the
    compact context/target set), so XLA partitions the encoder along
    tokens and inserts collectives only at the compact-key gather and
    the acquisition argmax.
    """
    n_pool = batch.x.shape[1]
    n = mesh.shape[axis_name]
    if n_pool % n:
        # padding the pool would add phantom selectable candidates (the
        # acquisition softmax masks only context/consumed tokens), so the
        # caller must size the pool to the mesh: e.g. n_query_final=2047
        # with n_context_init=1 on 8 chips.
        raise ValueError(
            f"candidate pool of {n_pool} tokens is not divisible by the "
            f"{n}-way '{axis_name}' mesh axis; choose n_query so that "
            f"n_context_init + n_query is a multiple of {n}")

    def _put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 2 and x.shape[1] == n_pool:
            return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x),
                                 NamedSharding(mesh, P())), tree)
