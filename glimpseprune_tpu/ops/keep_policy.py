"""Keep-set policy: threshold / ratio-cap / min-floor / anchors, static shapes.

Reproduces the reference mask->keep-set semantics
(transformers_gp/models/qwen2_5_vl/model_gp.py:1495-1549 `_get_remain_masks`)
without data-dependent shapes:

1. keep = sigmoid(logit) > threshold
2. if kept fraction exceeds `max_remain_ratio`, the keep set is REPLACED by
   the top-floor(ratio*N) tokens by probability
3. if fewer than `min_remain_num` survive, the top-min_remain_num tokens are
   ADDED
4. anchor positions are forced kept

All branches are computed with per-row descending ranks (one sort per row)
and `jnp.where` selects — shapes stay [B, N] throughout; the boolean mask is
consumed by ops/compaction.py's fixed-budget gather.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _descending_rank(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-row rank (0 = largest) among valid entries; invalid entries get
    ranks after all valid ones. Ties broken by position (stable)."""
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg, axis=-1, stable=True)  # [B, N] positions by desc score
    n = scores.shape[-1]
    ranks = jnp.zeros_like(order)
    ranks = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(n), order.shape), jnp.argsort(order, axis=-1), axis=-1
    )
    # rank[p] = i where order[i] = p
    return ranks


def keep_scores_with_policy(
    probs: jnp.ndarray,  # [B, N] sigmoid probabilities
    valid: jnp.ndarray,  # [B, N] bool, real image tokens
    threshold: float,
    max_remain_ratio: Optional[float],
    min_remain_num: Optional[int],
    anchor_mask: Optional[jnp.ndarray] = None,  # [B, N] bool forced-keep
) -> jnp.ndarray:
    """Returns the keep mask [B, N] (False on invalid positions)."""
    probs = probs.astype(jnp.float32)
    keep = (probs > threshold) & valid
    n_valid = valid.sum(axis=-1, keepdims=True)  # [B, 1]
    rank = _descending_rank(probs, valid)

    if max_remain_ratio is not None:
        cnt = keep.sum(axis=-1, keepdims=True)
        cap = jnp.floor(max_remain_ratio * n_valid).astype(jnp.int32)
        over = cnt > cap  # reference: remain_ratio > max_remain_ratio
        top_cap = (rank < cap) & valid
        keep = jnp.where(over, top_cap, keep)

    if min_remain_num is not None:
        cnt = keep.sum(axis=-1, keepdims=True)
        under = cnt < min_remain_num
        top_min = (rank < min_remain_num) & valid
        keep = jnp.where(under, keep | top_min, keep)

    if anchor_mask is not None:
        keep = keep | (anchor_mask & valid)
    return keep


def select_keep_mask(
    mask_logits: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 0.5,
    max_remain_ratio: Optional[float] = None,
    min_remain_num: Optional[int] = 1,
    anchor_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Logit-level entry: sigmoid then policy."""
    return keep_scores_with_policy(
        jax.nn.sigmoid(mask_logits.astype(jnp.float32)),
        valid,
        threshold,
        max_remain_ratio,
        min_remain_num,
        anchor_mask,
    )


def _group_rank_desc(scores: jnp.ndarray, groups: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """Per-row rank (0 = best) of each element within its group by
    descending score. groups: [B, N] int, <0/invalid -> own trailing group."""
    B, N = scores.shape
    g = jnp.where(valid, groups, jnp.int32(N))
    r_global = _descending_rank(scores, valid)
    keys = g.astype(jnp.int64) * (N + 1) + r_global.astype(jnp.int64)
    order = jnp.argsort(keys, axis=-1)
    sorted_g = jnp.take_along_axis(g, order, axis=-1)
    pos = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), sorted_g[:, 1:] != sorted_g[:, :-1]], axis=1
    )
    group_start = jax.lax.cummax(jnp.where(is_start, pos, -1), axis=1)
    rank_sorted = pos - group_start
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(rank_sorted, inv, axis=-1)


def keep_scores_with_policy_grouped(
    probs: jnp.ndarray,      # [B, N]
    valid: jnp.ndarray,      # [B, N]
    group_ids: jnp.ndarray,  # [B, N] image index per slot (multi-image rows)
    threshold: float,
    max_remain_ratio: Optional[float],
    min_remain_num: Optional[int],
    anchor_mask: Optional[jnp.ndarray] = None,
    max_groups: int = 8,
) -> jnp.ndarray:
    """Per-image keep policy for multi-image rows — an EXTENSION, not the
    reference semantics: the reference's _get_remain_masks
    (model_gp.py:1495-1549) iterates per batch row with all images' logits
    concatenated, so its ratio-cap/min-floor budgets span the whole row
    (executably verified by tests/test_reference_differential.py). Enable
    via GPConfig.per_image_policy for balanced per-image budgets; computed
    with group-wise ranks/counts in static shapes; max_groups bounds the
    images per row (static)."""
    probs = probs.astype(jnp.float32)
    B, N = probs.shape
    keep = (probs > threshold) & valid
    rank = _group_rank_desc(probs, group_ids, valid)

    one_hot = (
        (group_ids[..., None] == jnp.arange(max_groups)[None, None, :])
        & valid[..., None]
    )  # [B, N, G]

    def group_count(mask):
        """Per-element count of True within its group -> [B, N]."""
        totals = (one_hot & mask[..., None]).sum(axis=1)  # [B, G]
        g = jnp.clip(group_ids, 0, max_groups - 1)
        return jnp.take_along_axis(totals, g, axis=-1)

    n_valid_g = group_count(valid)

    if max_remain_ratio is not None:
        cnt_g = group_count(keep)
        cap_g = jnp.floor(max_remain_ratio * n_valid_g).astype(jnp.int32)
        over = cnt_g > cap_g
        top_cap = (rank < cap_g) & valid
        keep = jnp.where(over, top_cap, keep)

    if min_remain_num is not None:
        cnt_g = group_count(keep)
        under = cnt_g < min_remain_num
        top_min = (rank < min_remain_num) & valid
        keep = jnp.where(under, keep | top_min, keep)

    if anchor_mask is not None:
        keep = keep | (anchor_mask & valid)
    return keep


def anchor_mask_from_grid(
    grid_hw: jnp.ndarray,  # [B, 2] merged (h, w) per image
    n_tokens: int,
    anchor_positions: tuple,
) -> jnp.ndarray:
    """Corner-anchor bool mask [B, n_tokens] (single-image rows only,
    matching reference model_gp.py:1523-1540)."""
    b = grid_hw.shape[0]
    mask = jnp.zeros((b, n_tokens), dtype=bool)
    h = grid_hw[:, 0]
    w = grid_hw[:, 1]
    rows = jnp.arange(b)
    for pos in anchor_positions:
        if pos == "tl":
            idx = jnp.zeros((b,), dtype=jnp.int32)
        elif pos == "tr":
            idx = (w - 1).astype(jnp.int32)
        elif pos == "bl":
            idx = ((h - 1) * w).astype(jnp.int32)
        elif pos == "br":
            idx = (h * w - 1).astype(jnp.int32)
        else:
            raise ValueError(f"Unknown anchor position {pos!r}")
        mask = mask.at[rows, idx].set(True)
    return mask
