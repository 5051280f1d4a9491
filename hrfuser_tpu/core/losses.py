"""Detection losses (CE, SmoothL1) with explicit weights/avg factors.

Rebuild of the reference losses on the HRFuser path
(`mmdet/models/losses/cross_entropy_loss.py`, `smooth_l1_loss.py`,
`accuracy.py`). All reductions are weighted sums over fixed-size arrays
divided by an `avg_factor`, so padded/unsampled rows simply carry zero
weight — no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def sigmoid_bce(logits: Array, targets: Array, weights: Array,
                avg_factor: Array) -> Array:
    """Binary CE with logits (RPN classification, `use_sigmoid=True`)."""
    loss = (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.sum(loss * weights) / jnp.maximum(avg_factor, 1.0)


def softmax_ce(logits: Array, labels: Array, weights: Array,
               avg_factor: Array) -> Array:
    """Multi-class CE (RCNN classification, `use_sigmoid=False`).

    labels: [N] int; weights: [N].
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.sum(ll * weights) / jnp.maximum(avg_factor, 1.0)


def smooth_l1(pred: Array, target: Array, weights: Array,
              avg_factor: Array, beta: float = 1.0) -> Array:
    """Huber/SmoothL1 (`smooth_l1_loss.py`): elementwise weights [..., 4]."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    return jnp.sum(loss * weights) / jnp.maximum(avg_factor, 1.0)


def accuracy(logits: Array, labels: Array, weights: Array) -> Array:
    """Weighted top-1 accuracy (logging metric, `accuracy.py`)."""
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    return jnp.sum(correct * weights) / jnp.maximum(jnp.sum(weights), 1.0)
