"""VScan (ViT stage): complementary global + local window scan, then merging.

Reference qwen_vscan/model/qwen2_5_vl_utils.py:136 `window_selection` walks
tokens in descending local-attention order, capping each 4x4 token window at
ceil(K_local / n_windows); :97 `token_merging` folds dropped tokens into
their nearest kept token (cosine). The greedy walk has an exact closed form
used here: a token is kept iff its within-window score rank < cap AND its
global-order rank among such eligible tokens < K_local. Global picks then
take the top K-K_local by last-block attention with kept tokens masked out
(qwen2_5_vl_custom.py:245-257).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _rank_desc(scores: jnp.ndarray, eligible: jnp.ndarray) -> jnp.ndarray:
    """Per-row rank (0 = best) among eligible entries by descending score."""
    masked = jnp.where(eligible, scores, -jnp.inf)
    order = jnp.argsort(-masked, axis=-1, stable=True)
    return jnp.argsort(order, axis=-1)


def window_capped_rank(
    scores: jnp.ndarray,   # [B, N]
    valid: jnp.ndarray,    # [B, N]
    grid_hw: jnp.ndarray,  # [B, 2] merged (h, w); tokens are raster order
    window: int,
    cap: jnp.ndarray,      # [B] per-window keep cap
) -> jnp.ndarray:
    """Within-window descending-score rank per token [B, N]."""
    B, N = scores.shape
    j = jnp.arange(N)[None, :]
    h = grid_hw[:, 0:1]
    w = grid_hw[:, 1:2]
    row = j // jnp.maximum(w, 1)
    col = j % jnp.maximum(w, 1)
    nwh = jnp.maximum(h // window, 1)
    nww = jnp.maximum(w // window, 1)
    wx = jnp.minimum(row // window, nwh - 1)
    wy = jnp.minimum(col // window, nww - 1)
    win_id = (wx * nww + wy).astype(jnp.int32)
    win_id = jnp.where(valid, win_id, jnp.int32(N))  # padding -> own group

    g_rank = _rank_desc(scores, valid)
    # lexicographic sort: (window, score rank)
    keys = win_id.astype(jnp.int64) * (N + 1) + g_rank.astype(jnp.int64)
    order = jnp.argsort(keys, axis=-1)
    sorted_win = jnp.take_along_axis(win_id, order, axis=-1)
    pos = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), sorted_win[:, 1:] != sorted_win[:, :-1]], axis=1
    )
    group_start = jax.lax.cummax(jnp.where(is_start, pos, -1), axis=1)
    w_rank_sorted = pos - group_start
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(w_rank_sorted, inv, axis=-1)


def vscan_select(
    local_scores: jnp.ndarray,   # [B, N] attention-received, local layer
    global_scores: jnp.ndarray,  # [B, N] attention-received, last layer
    valid: jnp.ndarray,          # [B, N]
    grid_hw: jnp.ndarray,        # [B, 2]
    k: int,
    window: int = 4,
) -> jnp.ndarray:
    """Keep mask [B, N]: K/2 window-capped local picks + K-K/2 global picks."""
    B, N = local_scores.shape
    n_valid = valid.sum(-1)
    k_eff = jnp.minimum(k, n_valid)  # [B]
    k_local = k_eff // 2
    k_global = k_eff - k_local

    h = grid_hw[:, 0]
    w = grid_hw[:, 1]
    n_windows = jnp.maximum(h // window, 1) * jnp.maximum(w // window, 1)
    cap = jnp.ceil(k_local / jnp.maximum(n_windows, 1)).astype(jnp.int32)

    w_rank = window_capped_rank(local_scores, valid, grid_hw, window, cap)
    eligible = (w_rank < cap[:, None]) & valid
    local_rank = _rank_desc(local_scores, eligible)
    keep_local = eligible & (local_rank < k_local[:, None])

    g_scores = jnp.where(keep_local, -jnp.inf, global_scores.astype(jnp.float32))
    g_rank = _rank_desc(g_scores, valid & ~keep_local)
    keep_global = valid & ~keep_local & (g_rank < k_global[:, None])
    return keep_local | keep_global


def merge_dropped_into_kept(
    embeds: jnp.ndarray,  # [B, N, D]
    keep: jnp.ndarray,    # [B, N]
    valid: jnp.ndarray,
    scaling: float = 1.0,
) -> jnp.ndarray:
    """Each dropped token joins its nearest kept token (cosine); kept tokens
    become (scaling*kept + sum assigned) / (scaling + count). Reference
    token_merging semantics, batched with an [N, N] similarity (N <= ~1.3k)."""
    x = embeds.astype(jnp.float32)
    n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("bnd,bmd->bnm", n, n)  # [B, N(drop), N(keep-cand)]
    sim = jnp.where(keep[:, None, :], sim, -jnp.inf)
    assign = jnp.argmax(sim, axis=-1)  # [B, N] nearest kept index
    dropped = valid & ~keep
    one_hot = jax.nn.one_hot(assign, embeds.shape[1], dtype=jnp.float32)
    one_hot = one_hot * dropped[:, :, None]
    summed = jnp.einsum("bnm,bnd->bmd", one_hot, x)
    counts = one_hot.sum(axis=1)  # [B, N]
    merged = (scaling * x + summed) / (scaling + counts)[:, :, None]
    out = jnp.where(keep[:, :, None], merged, x)
    return out.astype(embeds.dtype)
