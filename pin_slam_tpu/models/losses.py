"""Mapping losses (reference: utils/loss.py).

All losses take explicit validity masks so padded batch entries contribute
nothing (static-shape discipline).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    return jnp.sum(jnp.where(mask, x, 0.0)) / denom


def sdf_bce_loss(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    sigma: float,
    weight: Optional[jnp.ndarray],
    mask: jnp.ndarray,
    weighted: bool = False,
) -> jnp.ndarray:
    """BCE-with-logits between pred/sigma and sigmoid(label/sigma)
    (reference: utils/loss.py:45-63)."""
    logits = pred / sigma
    target = jax.nn.sigmoid(label / sigma)
    # numerically stable bce with logits
    per = jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if weighted and weight is not None:
        per = per * weight
    return _masked_mean(per, mask)


def sdf_zhong_loss(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    trunc_dist: Optional[float],
    weight: Optional[jnp.ndarray],
    mask: jnp.ndarray,
    weighted: bool = False,
) -> jnp.ndarray:
    """(reference: utils/loss.py:67-84)"""
    mid = label / 2.0
    shift_abs = jnp.abs(pred - mid)
    mid_abs = jnp.abs(mid)
    loss = jnp.where(shift_abs > mid_abs, shift_abs - mid_abs, 0.0)
    if trunc_dist is not None:
        loss = jnp.where(jnp.abs(label) < trunc_dist, jnp.abs(pred - label), loss)
    if weighted and weight is not None:
        loss = loss * weight
    return _masked_mean(loss, mask)


def sdf_diff_loss(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    mask: jnp.ndarray,
    l2: bool = True,
) -> jnp.ndarray:
    """L1/L2 sdf regression (reference: utils/loss.py:10-28)."""
    diff = pred - label
    per = diff * diff if l2 else jnp.abs(diff)
    if weight is not None:
        per = per * weight
    return _masked_mean(per, mask)


def eikonal_loss(grad: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(|grad| - 1)^2 (reference: utils/mapper.py:761-780).

    The norm is epsilon-guarded: queries with zero valid neighbors have an
    exactly-zero gradient, and the backward pass of sqrt at 0 is NaN — one
    poisoned row would corrupt every parameter through the shared batch.
    """
    gn = jnp.sqrt(jnp.sum(grad * grad, axis=-1) + 1e-12)
    return _masked_mean((gn - 1.0) ** 2, mask)


def color_l1_loss(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    mask: jnp.ndarray,
    weighted: bool = False,
) -> jnp.ndarray:
    """(reference: utils/loss.py:31-41, l1 default)"""
    per = jnp.abs(pred - label)
    if weighted and weight is not None:
        per = per * weight[:, None]
    return _masked_mean(per, mask[:, None] & jnp.ones_like(per, dtype=bool))


def sem_nll_loss(
    log_prob: jnp.ndarray,   # [N, S]
    label: jnp.ndarray,      # [N] i32
    mask: jnp.ndarray,       # [N]
) -> jnp.ndarray:
    """NLL over labeled samples (reference: utils/mapper.py:783-800)."""
    label_c = jnp.clip(label, 0, log_prob.shape[-1] - 1)
    per = -jnp.take_along_axis(log_prob, label_c[:, None], axis=1)[:, 0]
    return _masked_mean(per, mask)
