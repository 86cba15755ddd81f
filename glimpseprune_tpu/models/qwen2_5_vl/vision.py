"""Windowed vision transformer (Qwen2.5-VL-style) with feature taps.

Runs on the *window-padded packed* patch layout (preprocessing/geometry.py):
windowed blocks use dense batched [n_windows, wp] attention, the few
full-attention blocks use flash/segment attention over per-image segment ids
(replacing the reference's cu_seqlens machinery, model_gp.py:1779-1801).

Depth is organized as scanned runs: consecutive windowed blocks share one
stacked-param lax.scan, full-attention blocks are unrolled individually —
HLO stays small (the axon AOT compiler is minutes-per-program on unrolled
graphs) and the fullatt boundaries are exactly where the GP taps and
VisionZip/VScan importance probes live (Qwen2.5-VL: fullatt_block_indexes ==
default selected_visual_layers == (7, 15, 23, 31)).

Feature taps stay in slot order — the reference un-permutes then re-permutes
them (model_gp.py:1811, :275); we skip the round trip.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import VisionConfig
from glimpseprune_tpu.models.layers import ACT2FN
from glimpseprune_tpu.ops.attention import (
    batched_window_attention,
    fused_window_attention,
    segment_attention,
)
from glimpseprune_tpu.ops.rope import apply_rotary, vision_rope_cos_sin


# --------------------------------------------------------------------- #
# pure block math (params = one block's subtree)


def _rms(x, weight, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * xf).astype(x.dtype)


def _dense(x, p, dtype, a8: bool = False):
    if "kernel_q" in p and a8 and "lora_a" not in p:
        # dynamic W8A8 (quantization.matmul_w8a8): the v5e native int8 MXU
        # mode — 1.43x measured vs bf16 at the 16k-token ViT MLP shape
        from glimpseprune_tpu.quantization import matmul_w8a8

        y = matmul_w8a8(x, p["kernel_q"], p["kernel_scale"], dtype)
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    if "kernel_q" in p:
        # weight-only int8 (quantization.py): dequant fuses into the matmul;
        # only this layer's bf16 kernel materializes inside the scan
        w = p["kernel_q"].astype(dtype) * p["kernel_scale"].astype(dtype)
    elif "kernel_q4" in p:
        # 4-bit tier: two nibbles per int8 byte + group-64 scales; under a8
        # the merger's decoder-sized shapes route to the W4A8 prefill
        # kernel, block shapes (K=1280) keep the XLA dequant path (faster
        # there — chip-measured, docs/ROUND5.md)
        from glimpseprune_tpu.quantization import matmul_int4_auto

        y = matmul_int4_auto(x.astype(dtype), p, dtype,
                             a8=a8 and "lora_a" not in p)
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    else:
        w = p["kernel"].astype(dtype)
    y = x.astype(dtype) @ w
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _block_qkv(cfg: VisionConfig, pb, x, cos, sin, dtype):
    p = x.shape[0]
    qkv = _dense(x, pb["attn"]["qkv"], dtype, cfg.act_quant in ("int8", "prefill"))
    q, k, v = jnp.split(qkv.reshape(p, 3, cfg.num_heads, cfg.head_dim), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]
    q = apply_rotary(q[None], cos[None], sin[None])[0]
    k = apply_rotary(k[None], cos[None], sin[None])[0]
    return q, k, v


def _block_fwd(cfg: VisionConfig, pb, x, cos, sin, segment_ids, valid, wp: int,
               dtype, emit_importance: bool = False, dense_attn: bool = False):
    """One ViT block; wp > 0 selects the dense window path. dense_attn is the
    static single-unpadded-image promise forwarded to segment_attention."""
    p = x.shape[0]
    # the ViT is prefill-only compute: both tiers enable W8A8 here
    a8 = cfg.act_quant in ("int8", "prefill")
    h = _rms(x, pb["norm1"]["weight"])
    if wp > 0 and not emit_importance:
        # fused rope+attention over the qkv output's natural layout
        qkv = _dense(h, pb["attn"]["qkv"], dtype, a8)
        qkv = qkv.reshape(p, 3, cfg.num_heads, cfg.head_dim)
        attn = fused_window_attention(qkv, cos, sin, valid, wp)
    else:
        q, k, v = _block_qkv(cfg, pb, h, cos, sin, dtype)
        if wp > 0:
            attn = batched_window_attention(q, k, v, valid, wp)
        else:
            attn = segment_attention(q, k, v, segment_ids, dense=dense_attn,
                                     int8_qk=a8 and cfg.attn_qk_int8
                                     and not emit_importance,
                                     int8_pv=a8 and cfg.attn_pv_int8
                                     and not emit_importance)
    x = x + _dense(attn.reshape(p, cfg.hidden_size), pb["attn"]["proj"], dtype, a8)

    importance = None
    if emit_importance:
        # attention *received* per key + head-mean keys (VisionZip/VScan,
        # reference qwen_visionzip/qwen2_5vl_visionzip.py:598-615)
        scale = 1.0 / jnp.sqrt(jnp.float32(cfg.head_dim))
        logits = jnp.einsum("shd,thd->hst", q, k, preferred_element_type=jnp.float32) * scale
        allowed = (segment_ids[:, None] == segment_ids[None, :]) & (segment_ids >= 0)[:, None]
        allowed = allowed | jnp.eye(p, dtype=bool)
        logits = jnp.where(allowed[None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        importance = (probs.mean(0).sum(0), k.astype(jnp.float32).mean(axis=1))

    hm = _rms(x, pb["norm2"]["weight"])
    act = ACT2FN[cfg.hidden_act]
    m = pb["mlp"]
    x = x + _dense(act(_dense(hm, m["gate_proj"], dtype, a8)) * _dense(hm, m["up_proj"], dtype, a8),
                   m["down_proj"], dtype, a8)
    if emit_importance:
        return x, importance
    return x


def _init_block_stack(cfg: VisionConfig, n_blocks: int, param_dtype):
    H, I = cfg.hidden_size, cfg.intermediate_size

    def init(rng):
        keys = jax.random.split(rng, 6)

        def dense(key, fan_in, fan_out):
            k = (jax.random.normal(key, (n_blocks, fan_in, fan_out)) / jnp.sqrt(fan_in))
            return {"kernel": k.astype(param_dtype),
                    "bias": jnp.zeros((n_blocks, fan_out), param_dtype)}

        return {
            "norm1": {"weight": jnp.ones((n_blocks, H), jnp.float32)},
            "norm2": {"weight": jnp.ones((n_blocks, H), jnp.float32)},
            "attn": {
                "qkv": dense(keys[0], H, 3 * H),
                "proj": dense(keys[1], H, H),
            },
            "mlp": {
                "gate_proj": dense(keys[2], H, I),
                "up_proj": dense(keys[3], H, I),
                "down_proj": dense(keys[4], I, H),
            },
        }

    return init


class VisionTransformer(nn.Module):
    """Window-padded packed ViT with scanned windowed runs.

    Inputs (window-padded slot layout, preprocessing/geometry.py):
      patches   [P, in_dim]  P = n_windows * window_patches
      pos_ids   [P, 2]       RoPE (h, w) ids
      full_seg  [P]          image ids for full-attention blocks (-1 = pad)
      valid     [P]          real-patch mask

    Returns (merged [P//mu, out_hidden], taps list, [importance]) in slot
    order. Taps must sit at full-attention block indexes (they do for every
    published Qwen2.5-VL config); importance = (received_last, keys_last,
    received_local) for VisionZip/VScan.
    """

    cfg: VisionConfig
    tap_layers: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.patch_embed = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        init_fn = _init_block_stack(c, c.depth, self.param_dtype)
        if c.weight_quant in ("int8", "int4"):
            from glimpseprune_tpu.quantization import quantize_structure
            _base = init_fn
            _mode = c.weight_quant
            init_fn = lambda rng: quantize_structure(_base(rng), mode=_mode)
        self.blocks = self.param("blocks", init_fn)
        self.merger_ln_q = self.param(
            "merger_ln_q", lambda rng: {"weight": jnp.ones((c.hidden_size,), jnp.float32)}
        )
        mu = c.spatial_merge_unit
        self.merger_fc1 = nn.Dense(mu * c.hidden_size, use_bias=True, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.merger_fc2 = nn.Dense(c.out_hidden_size, use_bias=True, dtype=self.dtype,
                                   param_dtype=self.param_dtype)

    def __call__(self, patches, pos_ids, full_seg, valid,
                 emit_importance: bool = False, dense_attn: bool = False):
        c = self.cfg
        mu = c.spatial_merge_unit
        win = c.window_size // c.spatial_merge_size // c.patch_size
        wp = win * win * mu
        x = self.patch_embed(patches.astype(self.dtype))
        cos, sin = vision_rope_cos_sin(pos_ids, c.head_dim)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)

        fullatt = set(c.fullatt_block_indexes)
        first_fullatt = min(fullatt) if fullatt else 0

        blocks = self.blocks

        def scan_run(x, start, end):
            """Scan windowed blocks [start, end) — dynamic-indexed from the
            stack (an upfront slice would copy the run's weights)."""
            if start >= end:
                return x

            def body(carry, bidx):
                pb = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, bidx, 0, keepdims=False),
                    blocks,
                )
                return _block_fwd(c, pb, carry, cos, sin, full_seg, valid, wp,
                                  self.dtype), None

            x, _ = jax.lax.scan(body, x, jnp.arange(start, end))
            return x

        taps: List[Optional[jnp.ndarray]] = [None] * len(self.tap_layers)
        importance = None
        received_local = None
        cursor = 0
        # unroll at: full-attention blocks, tap layers, and (for importance)
        # the final block; everything between is one scanned run
        boundary_set = fullatt | set(self.tap_layers)
        if emit_importance:
            boundary_set |= {first_fullatt, c.depth - 1}
        boundaries = sorted(b for b in boundary_set if 0 <= b < c.depth)
        for bidx in boundaries:
            x = scan_run(x, cursor, bidx)
            pb = jax.tree_util.tree_map(lambda a: a[bidx], self.blocks)
            is_full = bidx in fullatt
            want_imp = emit_importance and (bidx == c.depth - 1 or bidx == first_fullatt)
            out = _block_fwd(c, pb, x, cos, sin, full_seg, valid,
                             0 if is_full else wp, self.dtype,
                             emit_importance=want_imp, dense_attn=dense_attn)
            if want_imp:
                x, (received, keys_mean) = out
                pooled = received.reshape(-1, mu).mean(axis=1)
                if bidx == first_fullatt:
                    received_local = pooled
                if bidx == c.depth - 1:
                    importance = (
                        pooled,
                        keys_mean.reshape(-1, mu, keys_mean.shape[-1]).mean(axis=1),
                        received_local if received_local is not None else pooled,
                    )
            else:
                x = out
            if bidx in self.tap_layers:
                taps[self.tap_layers.index(bidx)] = (
                    x.reshape(-1, mu, c.hidden_size).mean(axis=1)
                )
            cursor = bidx + 1
        x = scan_run(x, cursor, c.depth)

        merged = _rms(x, self.merger_ln_q["weight"])
        merged = merged.reshape(-1, mu * c.hidden_size)
        merged = self.merger_fc1(merged)
        merged = nn.gelu(merged, approximate=False)
        merged = self.merger_fc2(merged)
        if emit_importance:
            return merged, taps, importance
        return merged, taps
