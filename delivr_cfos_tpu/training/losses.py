"""Segmentation losses for BasicUNet training.

The reference ships training patches (training_data/cFos: 48 raw + 41 gt
100³ volumes) but no training code (SURVEY.md §2.4); this module supplies the
standard Dice+BCE objective used for this class of cFos segmentation models
so checkpoints can be produced in-framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Soft Dice over the whole batch; logits (N, D, H, W, 1), targets same."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    num = 2.0 * jnp.sum(probs * t) + eps
    den = jnp.sum(probs) + jnp.sum(t) + eps
    return 1.0 - num / den


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE, mean over voxels."""
    z = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.mean(jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))))


def dice_bce_loss(logits, targets, dice_weight: float = 1.0, bce_weight: float = 1.0):
    return dice_weight * dice_loss(logits, targets) + bce_weight * bce_loss(
        logits, targets
    )
