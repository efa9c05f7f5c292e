"""Target-mask construction and target weighting.

Capability parity with the reference mask subsystem
(reference: utils/target_mask.py:5-125).  Masks are built host-side with
numpy once per epoch (they are shared across the batch, exactly as in the
reference) and passed to the jitted step as a boolean device array — mask
*contents* never trigger recompilation because only shapes are traced.

The TPU-first addition is :func:`target_weight_vectors`: the reference
branches in Python on ``(embedding_type, mask_type)`` to decide how masked
target log-likelihoods are averaged (train_aline.py:99-110).  Here those
branches collapse into two per-position weight vectors computed host-side,
so the jitted training step is branch-free:

    nll_query      = -(target_ll * w_query).sum(-1)
    nll_prediction = -(target_ll * w_prediction).sum(-1)
"""
from __future__ import annotations

import random as pyrandom
from typing import Optional, Sequence, Tuple

import numpy as np


def create_target_mask(
    mask_type: str,
    embedding_type: str,
    n_target_data: int,
    n_target_theta: int,
    n_selected_targets: Optional[int] = None,
    predefined_masks: Optional[Sequence[Sequence[bool]]] = None,
    predefined_mask_weights: Optional[Sequence[float]] = None,
    mask_index: Optional[int] = None,
    attend_to: Optional[str] = None,
    rng: Optional[pyrandom.Random] = None,
) -> np.ndarray:
    """Build a boolean [n_target_data + n_target_theta] mask.

    Semantics match the reference exactly (utils/target_mask.py:5-104):

    - ``all``:        attend to every target.
    - ``none``:       attend to no target (ACE operation).
    - ``partial``:    random subset of size ``n_selected_targets``
                      (data/theta modes).
    - ``predefined``: pick one of ``predefined_masks`` — by ``mask_index``
                      if given, else weighted (or uniform) random choice.
    - ``split``:      mix mode only — all-data XOR all-theta, chosen by
                      ``attend_to`` or a fair coin.
    """
    rng = rng or pyrandom
    n_target = n_target_data + n_target_theta
    mask = np.zeros(n_target, dtype=bool)

    if mask_type == "all":
        mask[:] = True
    elif mask_type == "none":
        pass
    elif mask_type == "partial":
        if embedding_type in ("data", "theta"):
            idx = rng.sample(range(n_target), int(n_selected_targets))
            mask[idx] = True
    elif mask_type == "predefined":
        if mask_index is not None:
            chosen = predefined_masks[mask_index]
        elif (predefined_mask_weights is not None
              and len(predefined_mask_weights) == len(predefined_masks)):
            w = np.asarray(predefined_mask_weights, dtype=np.float64)
            p = (w / w.sum()).tolist()
            idx = rng.choices(range(len(predefined_masks)), weights=p)[0]
            chosen = predefined_masks[int(idx)]
        else:
            chosen = rng.choice(list(predefined_masks))
        for i, should_attend in enumerate(chosen):
            if i < n_target and should_attend:
                mask[i] = True
    elif mask_type == "split":
        if embedding_type == "mix":
            if attend_to is not None:
                attend_to_data = attend_to == "data"
            else:
                attend_to_data = rng.choice([True, False])
            if attend_to_data:
                mask[:n_target_data] = True
            else:
                mask[n_target_data:] = True
    else:
        raise ValueError(f"unknown mask_type {mask_type!r}")
    return mask


def select_targets_by_mask(target_results: np.ndarray,
                           target_mask: np.ndarray) -> np.ndarray:
    """Index-select masked targets out of [B, n_target, ...]
    (reference: utils/target_mask.py:107-125).  Host-side helper for
    analysis; the jitted path uses weight vectors instead."""
    idx = np.where(np.asarray(target_mask))[0]
    return np.asarray(target_results)[:, idx]


def target_weight_vectors(
    mask: np.ndarray,
    embedding_type: str,
    mask_type: str,
    n_target_data: int,
    n_target_theta: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Weights reproducing the reference's NLL averaging semantics.

    Reference semantics (train_aline.py:92-110) for a per-target
    log-likelihood vector ``ll [B, n_target]``:

    * query NLL (reward signal), non-mix or mix with partial mask:
        ``-mean(ll[mask])``
    * query NLL, mix mode with mask_type == 'all':
        ``-(mean(ll[mask][:n_data]) + mean(ll[mask][n_data:]))``
        i.e. the data part and the theta part are averaged separately and
        SUMMED (each part weighs 1 regardless of its length).
    * prediction NLL, mix: ``-(mean(ll[:n_data]) + mean(ll[n_data:]))``
    * prediction NLL, non-mix: ``-mean(ll)``

    Returns ``(w_query, w_prediction)`` float32 vectors of length n_target
    such that ``-(ll * w).sum(-1)`` reproduces those quantities.
    """
    mask = np.asarray(mask, dtype=bool)
    n_target = n_target_data + n_target_theta
    assert mask.shape == (n_target,)

    def _normalized(m: np.ndarray) -> np.ndarray:
        w = m.astype(np.float32)
        s = w.sum()
        return w / s if s > 0 else w

    def _mix_split_weights(m: np.ndarray) -> np.ndarray:
        data_part = np.zeros(n_target, dtype=bool)
        data_part[:n_target_data] = True
        w = np.zeros(n_target, dtype=np.float32)
        for part in (m & data_part, m & ~data_part):
            c = part.sum()
            if c > 0:
                w[part] = 1.0 / c
        return w

    if embedding_type == "mix" and mask_type == "all":
        w_query = _mix_split_weights(mask)
    else:
        w_query = _normalized(mask)

    if embedding_type == "mix":
        w_pred = _mix_split_weights(np.ones(n_target, dtype=bool))
    else:
        w_pred = _normalized(np.ones(n_target, dtype=bool))

    return w_query, w_pred


def masking_description(mask_type: str, embedding_type: str,
                        n_selected_targets: Optional[int] = None,
                        mask_index: Optional[int] = None,
                        attend_to: Optional[str] = None) -> str:
    """Human-readable mask description
    (reference: utils/target_mask.py:128-155)."""
    if mask_type == "all":
        return "Attending to all targets"
    if mask_type == "none":
        return "Not attending to any targets"
    if mask_type == "partial":
        return f"Attending to {n_selected_targets} randomly selected targets"
    if mask_type == "predefined":
        if mask_index is not None:
            return f"Using predefined mask #{mask_index}"
        return "Using randomly selected predefined mask"
    if mask_type == "split" and embedding_type == "mix":
        if attend_to is not None:
            return f"Attending to all {attend_to} targets"
        return "Attending to either all data or all theta targets (random choice)"
    return "Unknown masking configuration"
