"""Training losses (reference src/runners/train.py:231-255)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean sigmoid BCE over valid entries (reference bce_loss,
    train.py:244-245 = BCEWithLogitsLoss)."""
    per = optax.sigmoid_binary_cross_entropy(logits.ravel(), labels.ravel())
    if mask is None:
        return per.mean()
    m = mask.ravel().astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def auc_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None, num_neg: int = 1) -> jnp.ndarray:
    """Square pairwise ranking loss sum((1 - (pos - neg))^2).

    The reference pairs the i-th positive with the i-th negative after
    truncating to equal counts (train.py:231-241).  With static shapes we
    reproduce that pairing by stable-sorting logits so positives (by label)
    come first, negatives last, and masking pairs beyond min(n_pos, n_neg).
    """
    logits = logits.ravel()
    labels = labels.ravel()
    valid = (jnp.ones_like(labels) if mask is None
             else mask.ravel().astype(labels.dtype))
    n_pos = jnp.sum((labels > 0.5) * valid)
    n_neg = jnp.sum((labels <= 0.5) * valid)
    k = jnp.minimum(n_pos, n_neg)

    # positives first (descending label, invalid last)
    pos_order = jnp.argsort(-(labels * valid) - valid * 0.1)
    neg_order = jnp.argsort(labels * valid + (1 - valid) * 2.0)
    pos_sorted = logits[pos_order]
    neg_sorted = logits[neg_order]
    idx = jnp.arange(logits.shape[0])
    pair_mask = (idx < k).astype(logits.dtype)
    diff = 1.0 - (pos_sorted - neg_sorted)
    return jnp.sum(diff * diff * pair_mask)


def get_loss(name: str):
    if name == "bce":
        return bce_loss
    if name == "auc":
        return auc_loss
    raise NotImplementedError(name)
