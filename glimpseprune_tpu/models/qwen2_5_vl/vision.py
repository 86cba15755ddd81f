"""Windowed vision transformer (Qwen2.5-VL-style) with feature taps.

Runs on the *window-ordered packed* patch sequence (permutation applied on
host/device boundary, see preprocessing/geometry.py). Window vs full
attention per block is encoded in per-patch segment ids, replacing the
reference's cu_seqlens machinery (model_gp.py:1779-1801 `_visual_forward`).
Feature taps for the GP fuser (merge-unit mean-pooled hidden states at
`selected_visual_layers`) stay in window order — the reference un-permutes
then re-permutes them (model_gp.py:1811, :275); we skip the round trip.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from glimpseprune_tpu.config import VisionConfig
from glimpseprune_tpu.models.layers import GatedMLP, RMSNorm
from glimpseprune_tpu.ops.attention import batched_window_attention, segment_attention
from glimpseprune_tpu.ops.rope import apply_rotary, vision_rope_cos_sin


class VisionAttention(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    window_patches: int = 0  # >0: dense batched window attention path

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids, valid, emit_importance: bool = False):
        c = self.cfg
        p = x.shape[0]
        qkv = nn.Dense(3 * c.hidden_size, use_bias=True, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(p, 3, c.num_heads, c.head_dim), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]  # [P, H, D]
        q = apply_rotary(q[None], cos[None], sin[None])[0]
        k = apply_rotary(k[None], cos[None], sin[None])[0]
        if self.window_patches > 0:
            out = batched_window_attention(q, k, v, valid, self.window_patches)
        else:
            out = segment_attention(q, k, v, segment_ids)
        out = out.reshape(p, c.hidden_size)

        importance = None
        if emit_importance:
            # VisionZip importance: head-mean softmax attention *received* per
            # key, and head-mean post-rope keys for the contextual-merge
            # metric (reference qwen_visionzip/qwen2_5vl_visionzip.py:598-615)
            import jax
            scale = 1.0 / jnp.sqrt(jnp.float32(c.head_dim))
            logits = jnp.einsum(
                "shd,thd->hst", q, k, preferred_element_type=jnp.float32
            ) * scale
            allowed = (segment_ids[:, None] == segment_ids[None, :]) & (
                segment_ids >= 0
            )[:, None]
            allowed = allowed | jnp.eye(p, dtype=bool)
            logits = jnp.where(allowed[None], logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1)
            received = probs.mean(0).sum(0)  # [P]
            keys_mean = k.astype(jnp.float32).mean(axis=1)  # [P, D]
            importance = (received, keys_mean)

        out = nn.Dense(c.hidden_size, use_bias=True, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="proj")(out)
        if emit_importance:
            return out, importance
        return out


class VisionBlock(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    window_patches: int = 0

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids, valid, emit_importance: bool = False):
        c = self.cfg
        attn_out = VisionAttention(c, dtype=self.dtype, param_dtype=self.param_dtype,
                                   window_patches=self.window_patches, name="attn")(
            RMSNorm(c.hidden_size, 1e-6, name="norm1")(x), cos, sin, segment_ids, valid,
            emit_importance=emit_importance,
        )
        importance = None
        if emit_importance:
            attn_out, importance = attn_out
        h = x + attn_out
        h = h + GatedMLP(
            c.hidden_size, c.intermediate_size, c.hidden_act, use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mlp",
        )(RMSNorm(c.hidden_size, 1e-6, name="norm2")(h))
        if emit_importance:
            return h, importance
        return h


class PatchMerger(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        mu = c.spatial_merge_unit
        x = RMSNorm(c.hidden_size, 1e-6, name="ln_q")(x)
        x = x.reshape(-1, mu * c.hidden_size)
        x = nn.Dense(mu * c.hidden_size, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(c.out_hidden_size, use_bias=True, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class VisionTransformer(nn.Module):
    """Packed, window-ordered ViT.

    Inputs (window-padded slot layout, preprocessing/geometry.py):
      patches   [P, in_dim]  P = n_windows * window_patches
      pos_ids   [P, 2]       RoPE (h, w) ids
      full_seg  [P]          image ids for full-attention blocks (-1 = pad)
      valid     [P]          real-patch mask

    Returns:
      merged [P//merge_unit, out_hidden]  (window order)
      taps   list of [P//merge_unit, hidden] at tap_layers (window order)
    """

    cfg: VisionConfig
    tap_layers: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches, pos_ids, full_seg, valid, emit_importance: bool = False):
        c = self.cfg
        mu = c.spatial_merge_unit
        win = c.window_size // c.spatial_merge_size // c.patch_size
        wp = win * win * mu
        x = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="patch_embed")(
            patches.astype(self.dtype)
        )
        cos, sin = vision_rope_cos_sin(pos_ids, c.head_dim)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)

        taps: List[Optional[jnp.ndarray]] = [None] * len(self.tap_layers)
        importance = None
        received_local = None
        first_fullatt = min(c.fullatt_block_indexes) if c.fullatt_block_indexes else 0
        for i in range(c.depth):
            is_full = i in c.fullatt_block_indexes
            # importance taps: last block (VisionZip dominant scores + merge
            # keys) and the first full-attention block (VScan local scan)
            want_imp = emit_importance and (i == c.depth - 1 or i == first_fullatt)
            out = VisionBlock(c, dtype=self.dtype, param_dtype=self.param_dtype,
                              window_patches=0 if is_full else wp,
                              name=f"blocks_{i}")(x, cos, sin, full_seg, valid,
                                                  emit_importance=want_imp)
            x = out[0] if want_imp else out
            if want_imp:
                received, keys_mean = out[1]
                pooled = received.reshape(-1, mu).mean(axis=1)
                if i == first_fullatt:
                    received_local = pooled
                if i == c.depth - 1:
                    importance = (
                        pooled,
                        keys_mean.reshape(-1, mu, keys_mean.shape[-1]).mean(axis=1),
                        received_local if received_local is not None else pooled,
                    )
            if i in self.tap_layers:
                pos = self.tap_layers.index(i)
                taps[pos] = x.reshape(-1, mu, c.hidden_size).mean(axis=1)

        merged = PatchMerger(c, dtype=self.dtype, param_dtype=self.param_dtype, name="merger")(x)
        if emit_importance:
            return merged, taps, importance
        return merged, taps
