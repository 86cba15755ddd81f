"""Visual-token importance predictor ("VIP" / AttnFuser family).

Flax re-design of the reference fusers (transformers_gp/models/qwen2_5_vl/
model_gp.py:104-371): tiny transformer heads that fuse the glimpse token's
per-layer/per-head attention rows — conditioned on intermediate ViT features
(V1) or not (V2) — into per-visual-token keep/drop logits.

Layout change vs reference: the reference runs the fuser over the packed
(batch-concatenated) token sequence with cu_seqlens loops; we run a batched
[B, N, ...] layout with per-row segment ids and validity masks — every row is
one image padded to N slots, so shapes are static and the attention maps onto
the MXU as one batched matmul. Window permutation/unpermutation happens via
host-precomputed per-row index arrays (FuserGeometry).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from glimpseprune_tpu.config import GPConfig, ModelConfig
from glimpseprune_tpu.models.layers import ACT2FN, GatedMLP, RMSNorm
from glimpseprune_tpu.ops.rope import apply_rotary, vision_rope_cos_sin
from glimpseprune_tpu.registry import Registry

ATTN_FUSERS: Registry = Registry("AttnFuser")


@dataclass
class FuserGeometry:
    """Host-precomputed per-row (single image per row) fuser geometry.

    All arrays [B, N] (N = padded merged-token slots per row):
      window_index:  natural -> window order permutation within the row
      reverse_index: inverse permutation
      segment_ids:   attention blocks in *window order* (window or global,
                     chosen by attn_fuse_global at build time); -1 = padding
      pos_ids:       [B, N, 2] RoPE (h, w) ids in *window order*
      valid:         real-token mask in *natural order*
    """

    window_index: np.ndarray
    reverse_index: np.ndarray
    segment_ids: np.ndarray
    pos_ids: np.ndarray
    valid: np.ndarray


def build_fuser_geometry(
    grid_hw_list,  # per row: (h, w) or a LIST of (h, w) for multi-image rows
    n_slots: int,
    window_size: int,
    spatial_merge_size: int,
    patch_size: int,
    attn_fuse_global: bool,
) -> FuserGeometry:
    """Per-row fuser geometry; multi-image rows concatenate their images'
    token spans (the reference fuser runs the packed multi-image sequence
    with cu_seqlens boundaries; here per-image segment-id offsets)."""
    from glimpseprune_tpu.preprocessing.geometry import (
        get_window_index,
        segment_ids_from_cu_seqlens,
        vision_pos_ids,
    )

    B = len(grid_hw_list)
    mu = spatial_merge_size * spatial_merge_size
    win_idx = np.zeros((B, n_slots), dtype=np.int32)
    rev_idx = np.zeros((B, n_slots), dtype=np.int32)
    segs = np.full((B, n_slots), -1, dtype=np.int32)
    pos = np.zeros((B, n_slots, 2), dtype=np.int32)
    valid = np.zeros((B, n_slots), dtype=bool)
    for b, grids in enumerate(grid_hw_list):
        if grids and isinstance(grids[0], (int, np.integer)):
            grids = [grids]  # single (h, w)
        off = 0
        seg_off = 0
        for (h, w) in grids:
            n = int(h) * int(w)
            grid = np.array([[1, h * spatial_merge_size, w * spatial_merge_size]])
            widx, cu_win = get_window_index(
                grid, window_size, spatial_merge_size, patch_size
            )
            if attn_fuse_global:
                seg_merged = np.zeros(n, dtype=np.int32)
                n_segs = 1
            else:
                seg_merged = segment_ids_from_cu_seqlens(cu_win // mu, n)
                n_segs = int(seg_merged.max()) + 1 if n else 0
            p_nat = vision_pos_ids(grid, spatial_merge_size)
            p_merged = p_nat.reshape(n, mu, 2)[:, 0] // spatial_merge_size
            win_idx[b, off : off + n] = off + widx
            segs[b, off : off + n] = seg_off + seg_merged
            pos[b, off : off + n] = p_merged[widx]
            valid[b, off : off + n] = True
            off += n
            seg_off += n_segs
        if off < n_slots:
            win_idx[b, off:] = np.arange(off, n_slots)
        rev_idx[b] = np.argsort(win_idx[b])
    return FuserGeometry(win_idx, rev_idx, segs, pos, valid)


def _permute(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, ...] permuted along axis 1 by per-row idx [B, N].

    Float 3-D permutes go through a one-hot matmul (TPU gathers of float
    matrices are slow; see gp_model._slot_onehot)."""
    if x.ndim == 3 and jnp.issubdtype(x.dtype, jnp.floating):
        oh = (idx[..., None] == jnp.arange(x.shape[1])[None, None, :]).astype(x.dtype)
        return jnp.einsum("bns,bsd->bnd", oh, x)
    extra = x.ndim - 2
    idxe = idx.reshape(idx.shape + (1,) * extra)
    return jnp.take_along_axis(x, jnp.broadcast_to(idxe, idx.shape + x.shape[2:]), axis=1)


def _normalized_mean_attention(
    attn_map: jnp.ndarray,  # [B, N, n_layers*n_heads]
    valid: jnp.ndarray,  # [B, N]
    use_attention_logits: bool,
    group_ids: Optional[jnp.ndarray] = None,  # [B, N] image index per slot
    max_groups: int = 8,
) -> jnp.ndarray:
    """Training-free importance: *per-image* min-max-normalized mean attention
    (reference AttnFuserDummy / ori_attn_supervision, model_gp.py:188-208,
    which loops st:ed per attn_grid entry — softmax and min/max never span
    image boundaries). Single-image rows pass group_ids=None (one group)."""
    m = attn_map.astype(jnp.float32).mean(axis=-1)  # [B, N]
    if group_ids is None:
        group_ids = jnp.zeros(m.shape, dtype=jnp.int32)
    g = jnp.clip(group_ids, 0, max_groups - 1)
    member = (
        jnp.arange(max_groups, dtype=g.dtype)[None, None, :] == g[..., None]
    ) & valid[..., None]  # [B, N, G]

    def _per_element(per_group):  # [B, G] -> [B, N]
        return jnp.take_along_axis(per_group, g, axis=1)

    if use_attention_logits:
        # softmax within each image's token span
        lg = jnp.where(valid, m, -jnp.inf)
        gmax = jnp.max(jnp.where(member, lg[..., None], -jnp.inf), axis=1)  # [B, G]
        e = jnp.where(valid, jnp.exp(lg - _per_element(gmax)), 0.0)
        denom = jnp.sum(jnp.where(member, e[..., None], 0.0), axis=1)  # [B, G]
        m = e / jnp.maximum(_per_element(denom), 1e-30)
    else:
        m = jnp.exp(m)  # rows are log-probs
    mmin = _per_element(jnp.min(jnp.where(member, m[..., None], jnp.inf), axis=1))
    mmax = _per_element(jnp.max(jnp.where(member, m[..., None], -jnp.inf), axis=1))
    out = (m - mmin) / (mmax - mmin + 1e-6)
    return jnp.where(valid, out, 0.0)


class CondSdpaAttention(nn.Module):
    """Q/K from concat(features, condition), V from features only
    (reference model_gp.py:116-154)."""

    hidden_size: int
    cond_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, segment_ids, cos, sin, valid):
        b, n, _ = x.shape
        qk_size = self.hidden_size + self.cond_size
        qk_in = x if cond is None else jnp.concatenate([x, cond], axis=-1)
        q = nn.Dense(qk_size, use_bias=False, dtype=self.dtype, name="q_proj")(qk_in)
        k = nn.Dense(qk_size, use_bias=False, dtype=self.dtype, name="k_proj")(qk_in)
        v = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, n, self.num_heads, -1)
        k = k.reshape(b, n, self.num_heads, -1)
        v = v.reshape(b, n, self.num_heads, -1)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        from glimpseprune_tpu.ops.attention import ATTENTION_IMPL, _use_flash

        if _use_flash(n):
            # the dense path materializes an f32 [B, H, N, N] score matrix —
            # 4 GB per row at the 16k-token operating point, the single
            # largest prefill allocation. Flash streams it. The qk head dim
            # (hidden+cond)/H differs from the v head dim (hidden/H): pad v
            # up — the zero columns contribute nothing and PV is the minor
            # cost here
            from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

            dv = v.shape[-1]
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, q.shape[-1] - dv)))
            out = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                vp.transpose(0, 2, 1, 3), segment_ids, segment_ids,
                causal=False, interpret=ATTENTION_IMPL == "flash_interpret",
            )[..., :dv]
            out = out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden_size)
        else:
            allowed = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
                segment_ids >= 0
            )[:, :, None]
            # padding rows attend to themselves only (flash zeroes them; both
            # land on rows masked out downstream)
            allowed = allowed | jnp.eye(n, dtype=bool)[None]
            scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
            logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32) * scale
            logits = jnp.where(allowed[:, None], logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(b, n, self.hidden_size)
        return nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype, name="o_proj")(out)


class AttnFuserLayer(nn.Module):
    hidden_size: int
    cond_size: int
    num_heads: int
    hidden_act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, segment_ids, cos, sin, valid):
        h = x + CondSdpaAttention(
            self.hidden_size, self.cond_size, self.num_heads, dtype=self.dtype, name="attn"
        )(RMSNorm(self.hidden_size, 1e-6, name="norm1")(x), cond, segment_ids, cos, sin, valid)
        h = h + GatedMLP(
            self.hidden_size, self.hidden_size * 2, self.hidden_act, use_bias=True,
            dtype=self.dtype, name="mlp",
        )(RMSNorm(self.hidden_size, 1e-6, name="norm2")(h))
        return h


class BaseAttnFuser(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @property
    def gp(self) -> GPConfig:
        return self.cfg.gp


@ATTN_FUSERS.register()
class AttnFuserDummy(BaseAttnFuser):
    """Training-free predictor: normalized mean attention as logits."""

    @nn.compact
    def __call__(self, attn_map, taps, geom_window_index, geom_reverse_index,
                 geom_segment_ids, geom_pos_ids, valid, training=False,
                 group_ids=None):
        out = _normalized_mean_attention(
            attn_map, valid, self.gp.use_attention_logits, group_ids
        )
        return out[None]  # [1, B, N]


@ATTN_FUSERS.register()
class AttnFuserV1(BaseAttnFuser):
    """Conditioned fuser: one AttnFuserLayer per selected ViT tap layer.

    Inputs (natural order unless noted):
      attn_map [B, N, n_sel_layers*n_heads]  harvested glimpse rows
      taps     list of [B, N, vit_hidden]    ViT features (natural order)
      geometry arrays from FuserGeometry
    Returns logits [n_out, B, N] (natural order); last row is the decision
    map, earlier rows are deep-supervision/ori-attn outputs.
    """

    with_condition: bool = True

    @nn.compact
    def __call__(self, attn_map, taps, geom_window_index, geom_reverse_index,
                 geom_segment_ids, geom_pos_ids, valid, training=False,
                 group_ids=None):
        gp = self.gp
        n_fuser_layers = len(gp.selected_visual_layers)
        cond_size = gp.visual_cond_size if (self.with_condition and n_fuser_layers > 0) else 0
        heads = gp.attn_fuse_num_heads
        qk_head_dim = (gp.attn_fuse_size + cond_size) // heads

        outs: List[jnp.ndarray] = []
        if gp.ori_attn_supervision and not training:
            outs.append(
                _normalized_mean_attention(
                    attn_map, valid, gp.use_attention_logits, group_ids
                )
            )

        x = nn.Dense(gp.attn_fuse_size, use_bias=True, dtype=self.dtype, name="attn_in_proj")(
            attn_map.astype(self.dtype)
        )
        x = _permute(x, geom_window_index)
        valid_win = _permute(valid, geom_window_index)

        b, n, _ = x.shape
        cos, sin = vision_rope_cos_sin(geom_pos_ids.reshape(-1, 2), qk_head_dim)
        cos = cos.reshape(b, n, qk_head_dim).astype(self.dtype)
        sin = sin.reshape(b, n, qk_head_dim).astype(self.dtype)

        for i in range(n_fuser_layers):
            cond = None
            if self.with_condition:
                cond = nn.Dense(
                    cond_size, use_bias=True, dtype=self.dtype, name=f"cond_in_projs_{i}"
                )(_permute(taps[i].astype(self.dtype), geom_window_index))
            x = AttnFuserLayer(
                gp.attn_fuse_size, cond_size, heads, gp.attn_fuse_hidden_act,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, cond, geom_segment_ids, cos, sin, valid_win)
            last = i == n_fuser_layers - 1
            if gp.deep_supervision or last:
                # params must exist in train AND eval (same checkpoint); the
                # [B,N,1] proj is cheap, so compute unconditionally and emit
                # per-mode (training: every layer; eval: last only)
                logit = nn.Dense(1, use_bias=True, dtype=self.dtype, name=f"attn_out_projs_{i}")(x)
                if training or last:
                    logit = _permute(logit[..., 0], geom_reverse_index)
                    outs.append(logit.astype(jnp.float32))
        return jnp.stack(outs, axis=0)  # [n_out, B, N]


@ATTN_FUSERS.register()
class AttnFuserV2(AttnFuserV1):
    """V1 without visual conditioning (reference model_gp.py:301-371)."""

    with_condition: bool = False


def make_fuser(cfg: ModelConfig, dtype=jnp.float32) -> BaseAttnFuser:
    cls = ATTN_FUSERS.get(cfg.gp.attn_fuse_type)
    return cls(cfg, dtype=dtype)
