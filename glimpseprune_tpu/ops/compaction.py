"""Fixed-budget sequence/KV compaction: the static-shape `_reduce_tokens`.

The reference physically gathers surviving positions out of ids/embeds/
hidden/position-ids/attention-mask and every layer's KV, then re-pads LEFT to
the batch max remaining length (model_gp.py:1552-1659) — data-dependent
shapes that would retrace XLA every step. Here the output length R is a
static budget; each row's survivors are gathered in order and right-aligned
(left-padded) into [B, R] buffers, with a validity mask carrying the true
lengths. One argsort + one gather per tensor; identical survivor ordering and
the same gathered-not-renumbered position ids (SURVEY.md §7 hard part:
mRoPE positions of survivors must be gathered, not renumbered).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompactedState(NamedTuple):
    """Gather plan for one compaction: apply to any [B, L, ...] tensor."""

    src: jnp.ndarray    # [B, R] source index into the original length-L axis
    valid: jnp.ndarray  # [B, R] bool; False = left padding
    n_kept: jnp.ndarray  # [B] true survivor counts


def compaction_indices(keep: jnp.ndarray, out_len: int) -> CompactedState:
    """keep [B, L] bool -> left-padded gather plan of static length out_len.

    If a row keeps more than out_len tokens, the *latest* survivors win
    (callers size out_len so this cannot happen for policy-driven masks).
    """
    b, l = keep.shape
    pos = jnp.arange(l)
    # kept positions sort first (ascending position), dropped after
    order = jnp.argsort(jnp.where(keep, pos, pos + l), axis=-1)  # [B, L]
    n = keep.sum(axis=-1)  # [B]
    offset = out_len - n  # [B] left-pad amount
    j = jnp.arange(out_len)[None, :]  # [1, R]
    src_rank = j - offset[:, None]  # [B, R]
    valid = src_rank >= 0
    src_rank = jnp.clip(src_rank, 0, l - 1)
    src = jnp.take_along_axis(order, src_rank, axis=-1)
    return CompactedState(src=src.astype(jnp.int32), valid=valid, n_kept=n)


def _onehot_plan(plan: CompactedState, src_len: int, dtype) -> jnp.ndarray:
    """[B, R, L] one-hot selection matrix (zero rows at padding slots).

    Large floating-point gathers are expressed as one-hot matmuls: XLA lowers
    scattered `gather` ops poorly on TPU (~25ms for the 24-layer KV
    compaction at 3B shapes) while the equivalent einsum rides the MXU in
    well under a millisecond.
    """
    oh = plan.src[..., None] == jnp.arange(src_len)[None, None, :]
    oh = oh & plan.valid[..., None]
    return oh.astype(dtype)


def gather_tokens(x: jnp.ndarray, plan: CompactedState, fill=0) -> jnp.ndarray:
    """x [B, L, ...] -> [B, R, ...] using the plan; padding slots get `fill`."""
    if x.ndim >= 3 and jnp.issubdtype(x.dtype, jnp.floating) and fill == 0:
        oh = _onehot_plan(plan, x.shape[1], x.dtype)
        flat = x.reshape(x.shape[0], x.shape[1], -1)
        out = jnp.einsum("brl,blf->brf", oh, flat)
        return out.reshape(x.shape[:1] + (plan.src.shape[1],) + x.shape[2:])
    src = plan.src
    extra = x.ndim - 2
    idx = src.reshape(src.shape + (1,) * extra)
    out = jnp.take_along_axis(x, jnp.broadcast_to(idx, src.shape + x.shape[2:]), axis=1)
    vmask = plan.valid.reshape(plan.valid.shape + (1,) * extra)
    return jnp.where(vmask, out, jnp.asarray(fill, dtype=x.dtype))


def gather_positions(position_ids: jnp.ndarray, plan: CompactedState) -> jnp.ndarray:
    """position_ids [3, B, L] -> [3, B, R]; padding slots get 1 (reference
    pads positions with 1, model_gp.py:1618)."""
    out = jnp.take_along_axis(position_ids, plan.src[None], axis=2)
    return jnp.where(plan.valid[None], out, 1)


def gather_kv(kv: jnp.ndarray, plan: CompactedState) -> jnp.ndarray:
    """kv [num_layers, B, L, heads, dim] -> [num_layers, B, R, heads, dim]
    as a single one-hot einsum (see _onehot_plan)."""
    L_layers, B, S = kv.shape[:3]
    oh = _onehot_plan(plan, S, kv.dtype)
    flat = kv.reshape(L_layers, B, S, -1)
    out = jnp.einsum("brs,lbsf->lbrf", oh, flat)
    return out.reshape((L_layers, B, plan.src.shape[1]) + kv.shape[3:])


def compact_sequence(keep: jnp.ndarray, out_len: int) -> CompactedState:
    """Alias for compaction_indices (public name)."""
    return compaction_indices(keep, out_len)
