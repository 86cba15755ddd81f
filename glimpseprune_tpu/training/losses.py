"""Mask-supervision losses (reference train_qwen_gp.py:224-344).

The reference losses consume Python lists of variable-length 1-D mask logits;
ours are batched [B, N] with a validity mask — same math, static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from glimpseprune_tpu.registry import Registry

LOSSES: Registry = Registry("loss")


@LOSSES.register("dice")
def dice_loss(
    mask_logits: jnp.ndarray,  # [B, N]
    target: jnp.ndarray,       # [B, N] bool/0-1
    valid: jnp.ndarray,        # [B, N]
    smooth: float = 1e-6,      # reference DiceLoss epsilon (train_qwen_gp.py:240)
) -> jnp.ndarray:
    probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    probs = jnp.where(valid, probs, 0.0)
    t = jnp.where(valid, target.astype(jnp.float32), 0.0)
    inter = (probs * t).sum(-1)
    denom = probs.sum(-1) + t.sum(-1)
    dice = (2 * inter + smooth) / (denom + smooth)
    return (1.0 - dice).mean()


@LOSSES.register("bce")
def bce_loss(
    mask_logits: jnp.ndarray,
    target: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    x = mask_logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    # numerically stable BCE-with-logits
    per = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per = jnp.where(valid, per, 0.0)
    # per-SAMPLE mean over that row's tokens, then batch mean — the
    # reference BCELoss averages each sample's F.binary_cross_entropy
    # (train_qwen_gp.py:296-313); a global valid-count mean would weight
    # rows by image size
    per_row = per.sum(-1) / jnp.maximum(valid.sum(-1), 1)
    return per_row.mean()


@LOSSES.register("mask")
def mask_loss(
    mask_logits: jnp.ndarray,
    target: jnp.ndarray,
    valid: jnp.ndarray,
    dice_weight: float = 1.0,
    bce_weight: float = 0.1,
) -> jnp.ndarray:
    """Weighted dice+bce (reference MaskLoss, train config default
    dice=1.0 bce=0.1 — train_configs/qwen2_5_7b_gp)."""
    return dice_weight * dice_loss(mask_logits, target, valid) + bce_weight * bce_loss(
        mask_logits, target, valid
    )


def mask_confusion_stats(
    keep: jnp.ndarray,   # [B, N] predicted bool
    target: jnp.ndarray,  # [B, N] bool
    valid: jnp.ndarray,
):
    """Per-batch TP/FP/FN/TN + IoU (reference cal_box_metrics semantics,
    viscot_eval/infer_cot.py:350-373)."""
    keep = keep & valid
    t = target & valid
    tp = (keep & t).sum(-1)
    fp = (keep & ~t).sum(-1)
    fn = (~keep & t).sum(-1)
    tn = (valid & ~keep & ~t).sum(-1)
    iou = tp / jnp.maximum(tp + fp + fn, 1)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn, "iou": iou}
