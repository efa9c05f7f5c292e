"""Checkpoint / resume.

The reference stores model+optimizer+scheduler state plus all four host RNG
streams (reference: utils/misc.py:61-135).  Here the device-side state is a
single pytree (params, opt_state, JAX PRNG key) saved with orbax, and the
host-side RNG (the python `random` stream that draws T and the mask type)
is pickled alongside — together they make training resume bit-exact.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tree_path(path: str) -> str:
    return os.path.join(os.path.abspath(path), "tree")


def _host_path(path: str) -> str:
    return os.path.join(os.path.abspath(path), "host_state.pkl")


def save_checkpoint(path: str, device_state: Any,
                    host_state: Optional[Dict] = None) -> str:
    """Save a device pytree + optional host-side state dict."""
    os.makedirs(os.path.abspath(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree_util.tree_map(np.asarray, device_state)
    ckptr.save(_tree_path(path), tree, force=True)
    ckptr.wait_until_finished()
    if host_state is not None:
        with open(_host_path(path), "wb") as f:
            pickle.dump(host_state, f)
    return os.path.abspath(path)


def load_checkpoint(path: str, template: Any):
    """Restore (device_state, host_state) — host_state is None if absent.

    ``template`` is a pytree with the target structure/shapes (e.g. a
    freshly initialized TrainState)."""
    if not os.path.exists(_tree_path(path)):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      template)
    tree = ckptr.restore(_tree_path(path), abstract)
    host_state = None
    if os.path.exists(_host_path(path)):
        with open(_host_path(path), "rb") as f:
            host_state = pickle.load(f)
    return tree, host_state
