"""VisionZip: attention-dominant top-k + uniform-stride contextual merging.

Reference qwen_visionzip/qwen2_5vl_visionzip.py:1916-1972 (selection/merge)
and :598-615 (importance = per-token attention-received from the last ViT
block, merge-unit pooled; keys = head-averaged K vectors). Semantics kept,
shapes made static: dominant/contextual counts derive from the static slot
count N, non-dominant ordinals come from a cumsum instead of nonzero().
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def visionzip_select(
    embeds: jnp.ndarray,      # [B, N, D] merged visual embeds (LLM space)
    importance: jnp.ndarray,  # [B, N] attention-received scores
    keys: jnp.ndarray,        # [B, N, Dk] similarity metric (ViT keys)
    valid: jnp.ndarray,       # [B, N]
    dominant_ratio: float = 0.65,
    contextual_ratio: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (keep mask [B, N], updated embeds [B, N, D]).

    Kept set = dominant top-k by importance ∪ contextual targets (uniform
    stride over the non-dominant subsequence); each remaining non-dominant
    token is merged (key-similarity argmax) into its nearest target, whose
    embedding becomes target + mean(assigned).
    """
    B, N, D = embeds.shape
    n_valid = valid.sum(-1)  # [B]
    dom_k = jnp.maximum((dominant_ratio * n_valid).astype(jnp.int32), 1)
    ctx_k_static = max(int(contextual_ratio * N), 1)
    ctx_k = jnp.maximum((contextual_ratio * n_valid).astype(jnp.int32), 1)

    imp = jnp.where(valid, importance.astype(jnp.float32), -jnp.inf)
    order = jnp.argsort(-imp, axis=-1, stable=True)
    rank = jnp.argsort(order, axis=-1)
    dominant = (rank < dom_k[:, None]) & valid

    # ordinal position within the valid non-dominant subsequence
    nd = valid & ~dominant
    pos_nd = jnp.cumsum(nd, axis=-1) - 1  # [B, N]
    n_nd = nd.sum(-1)  # [B]
    step = jnp.maximum(n_nd // ctx_k, 1)  # [B]
    is_target = nd & (pos_nd % step[:, None] == 0) & (pos_nd // step[:, None] < ctx_k[:, None])

    # gather up to ctx_k_static target slots per row (natural order)
    tpos = jnp.arange(N)
    t_order = jnp.argsort(jnp.where(is_target, tpos, tpos + N), axis=-1)
    t_idx = t_order[:, :ctx_k_static]  # [B, Ck]
    t_valid = jnp.take_along_axis(is_target, t_idx, axis=-1)

    kn = keys.astype(jnp.float32)
    kn = kn / jnp.maximum(jnp.linalg.norm(kn, axis=-1, keepdims=True), 1e-8)
    t_keys = jnp.take_along_axis(kn, t_idx[:, :, None], axis=1)  # [B, Ck, Dk]
    sim = jnp.einsum("bnd,bkd->bnk", kn, t_keys)
    sim = jnp.where(t_valid[:, None, :], sim, -jnp.inf)

    to_merge = nd & ~is_target
    assign = jnp.argmax(sim, axis=-1)  # [B, N]
    one_hot = jax.nn.one_hot(assign, ctx_k_static, dtype=jnp.float32)
    one_hot = one_hot * to_merge[:, :, None]
    counts = jnp.maximum(one_hot.sum(axis=1), 1.0)  # [B, Ck]
    agg = jnp.einsum("bnk,bnd->bkd", one_hot, embeds.astype(jnp.float32)) / counts[:, :, None]

    t_embeds = jnp.take_along_axis(embeds, t_idx[:, :, None], axis=1)
    new_t = t_embeds + jnp.where(t_valid[:, :, None], agg, 0.0).astype(embeds.dtype)
    bidx = jnp.arange(B)[:, None]
    cur = embeds[bidx, t_idx]
    upd = jnp.where(t_valid[:, :, None], new_t, cur)
    new_embeds = embeds.at[bidx, t_idx].set(upd)

    keep = dominant | is_target
    return keep & valid, new_embeds
