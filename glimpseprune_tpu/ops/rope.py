"""Rotary position embeddings: 2-D vision RoPE and 3-D mRoPE.

Semantics match Qwen2.5-VL: the LLM rope runs over three position channels
(t, h, w) whose cos/sin are spliced per `mrope_section` (reference relies on
HF `apply_multimodal_rotary_pos_emb`; our section-merge happens once at
cos/sin build time so the attention inner loop sees ordinary [B, L, D]
tables).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [..., L, n_heads, head_dim]; cos/sin: [..., L, head_dim] (broadcast over heads).

    Computed in x's dtype: under bf16 this keeps the rotation a single fused
    bf16 elementwise pass (an f32 promote+demote doubles HBM traffic per
    q/k per block — ~9ms across the 32-block ViT at bench shapes). cos/sin
    magnitudes are <= 1, so bf16 rounding here is benign; fp32 runs (parity
    tests) are unchanged.
    """
    cos = cos[..., :, None, :].astype(x.dtype)
    sin = sin[..., :, None, :].astype(x.dtype)
    return x * cos + rotate_half(x) * sin


def _inv_freq(dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))


def mrope_cos_sin(
    position_ids: jnp.ndarray,
    head_dim: int,
    theta: float,
    mrope_section: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """position_ids [3, B, L] -> (cos, sin) each [B, L, head_dim].

    Standard rope tables are built per (t, h, w) channel, then the head_dim
    halves are assembled by taking `mrope_section[i]` consecutive frequencies
    from channel i%3 (matching HF's split-cat of [3,B,L,D] tables).
    """
    inv = _inv_freq(head_dim, theta)  # [head_dim//2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv  # [3, B, L, head_dim//2]
    sections = list(mrope_section)
    assert sum(sections) == head_dim // 2, (sections, head_dim)
    parts = []
    start = 0
    for i, sec in enumerate(sections):
        parts.append(freqs[i % 3, ..., start : start + sec])
        start += sec
    half = jnp.concatenate(parts, axis=-1)  # [B, L, head_dim//2]
    emb = jnp.concatenate([half, half], axis=-1)  # [B, L, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def vision_rope_cos_sin(
    pos_ids: jnp.ndarray, head_dim: int, theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pos_ids [P, 2] (h, w) -> (cos, sin) each [P, head_dim].

    Qwen vision rotary: half the rotary dims encode h, half encode w; the
    (h|w) table of size head_dim//2 is duplicated to cover both rotate_half
    halves.
    """
    inv = _inv_freq(head_dim // 2, theta)  # [head_dim//4]
    h = pos_ids[:, 0].astype(jnp.float32)[:, None] * inv  # [P, head_dim//4]
    w = pos_ids[:, 1].astype(jnp.float32)[:, None] * inv
    half = jnp.concatenate([h, w], axis=-1)  # [P, head_dim//2]
    emb = jnp.concatenate([half, half], axis=-1)  # [P, head_dim]
    return jnp.cos(emb), jnp.sin(emb)
