"""Qwen2.5 text decoder: mRoPE GQA layers with harvest taps and a functional
KV cache.

The glimpse "harvest" (the reference's modified attention classes,
model_gp.py:393-703) is a side output of prefill: one extra
q_glimpse @ K^T einsum per selected layer, optionally masked log-softmaxed —
it never touches the main attention computation, so the hot path stays fully
fused. Layer ranges are first-class (run [0..reduce], then [reduce+1..end]
on the compacted sequence) to support the two-phase pruned prefill.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import TextConfig
from glimpseprune_tpu.models.layers import GatedMLP, RMSNorm
from glimpseprune_tpu.ops.attention import (
    causal_segment_attention,
    decode_attention,
)
from glimpseprune_tpu.ops.rope import apply_rotary


def harvest_attention_row(
    q: jnp.ndarray,  # [B, S, Hq, D] post-rope queries
    k: jnp.ndarray,  # [B, T, Hkv, D] post-rope keys
    q_index: jnp.ndarray,  # [B] glimpse-token position
    allowed_row: jnp.ndarray,  # [B, T] key positions the glimpse row may see
    use_attention_logits: bool,
) -> jnp.ndarray:
    """The glimpse token's cross-attention row over all keys -> [B, T, Hq].

    With use_attention_logits=False this is the *masked log-softmax* row: the
    normalization spans every non-masked key (causal+pad), exactly matching
    the reference fuser-input distribution (model_gp.py:487-496) — SURVEY.md
    §7 "hard parts".
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    sel_q = jnp.take_along_axis(q, q_index[:, None, None, None], axis=1)[:, 0]  # [B, Hq, D]
    groups = hq // hkv
    k_exp = jnp.repeat(k, groups, axis=2)  # [B, T, Hq, D]
    logits = jnp.einsum("bhd,bthd->bht", sel_q, k_exp, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d))
    if not use_attention_logits:
        logits = jnp.where(allowed_row[:, None, :], logits, -jnp.inf)
        logits = jax.nn.log_softmax(logits, axis=-1)
    return logits.transpose(0, 2, 1)  # [B, T, Hq]


class TextAttention(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bias = c.attention_bias
        self.q_proj = nn.Dense(c.num_attention_heads * c.head_dim, use_bias=bias, **kw)
        self.k_proj = nn.Dense(c.num_key_value_heads * c.head_dim, use_bias=bias, **kw)
        self.v_proj = nn.Dense(c.num_key_value_heads * c.head_dim, use_bias=bias, **kw)
        self.o_proj = nn.Dense(c.hidden_size, use_bias=False, **kw)

    def qkv(self, x, cos, sin):
        c = self.cfg
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, c.num_attention_heads, c.head_dim)
        k = self.k_proj(x).reshape(b, s, c.num_key_value_heads, c.head_dim)
        v = self.v_proj(x).reshape(b, s, c.num_key_value_heads, c.head_dim)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        return q, k, v

    def output(self, attn_out):
        b, s = attn_out.shape[:2]
        return self.o_proj(attn_out.reshape(b, s, -1))


class DecoderLayer(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.input_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps)
        self.self_attn = TextAttention(c, dtype=self.dtype, param_dtype=self.param_dtype)
        self.post_attention_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps)
        self.mlp = GatedMLP(
            c.hidden_size, c.intermediate_size, c.hidden_act, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def __call__(self, x, cos, sin, valid):
        """Needed so linen init traverses the module; same as prefill."""
        out, _, _, _ = self.prefill(x, cos, sin, valid)
        return out

    def prefill(
        self,
        x: jnp.ndarray,  # [B, S, H]
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        valid: jnp.ndarray,  # [B, S]
        q_index: Optional[jnp.ndarray] = None,
        harvest: bool = False,
        use_attention_logits: bool = False,
    ):
        h = self.input_layernorm(x)
        q, k, v = self.self_attn.qkv(h, cos, sin)
        attn = causal_segment_attention(q, k, v, valid)
        x = x + self.self_attn.output(attn)
        x = x + self.mlp(self.post_attention_layernorm(x))

        row = None
        if harvest:
            s = q.shape[1]
            causal_row = jnp.arange(s)[None, :] <= q_index[:, None]
            row = harvest_attention_row(
                q, k, q_index, valid & causal_row, use_attention_logits
            )
        return x, k, v, row

    def decode(
        self,
        x: jnp.ndarray,  # [B, S_new, H]
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        k_cache: jnp.ndarray,  # [B, T, Hkv, D]
        v_cache: jnp.ndarray,
        kv_valid: jnp.ndarray,  # [B, T] validity AFTER this write
        write_idx: jnp.ndarray,  # scalar: slot of the first new token
    ):
        h = self.input_layernorm(x)
        q, k, v = self.self_attn.qkv(h, cos, sin)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k.astype(k_cache.dtype), write_idx, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v.astype(v_cache.dtype), write_idx, axis=1)
        attn = decode_attention(q, k_cache, v_cache, kv_valid)
        x = x + self.self_attn.output(attn)
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, k_cache, v_cache


class TextDecoder(nn.Module):
    """Embedding + decoder stack + final norm + LM head, method-per-phase."""

    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.layers = [
            DecoderLayer(c, dtype=self.dtype, param_dtype=self.param_dtype, name=f"layers_{i}")
            for i in range(c.num_hidden_layers)
        ]
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps)
        if not c.tie_word_embeddings:
            self.lm_head = nn.Dense(c.vocab_size, use_bias=False, dtype=self.dtype,
                                    param_dtype=self.param_dtype)

    def __call__(self, input_ids, cos, sin, valid):
        """Init/traversal path: plain full prefill to logits."""
        x = self.embed(input_ids)
        x, _, _ = self.run_layers(x, cos, sin, valid)
        return self.logits(self.final_norm(x))

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def final_norm(self, x):
        return self.norm(x)

    def logits(self, x):
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(x)
        return self.lm_head(x)

    def run_layers(
        self,
        x: jnp.ndarray,
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        valid: jnp.ndarray,
        layer_start: int = 0,
        layer_end: Optional[int] = None,
        pre_layer_fn: Optional[Callable[[int, jnp.ndarray], jnp.ndarray]] = None,
        harvest_layers: Sequence[int] = (),
        q_index: Optional[jnp.ndarray] = None,
        use_attention_logits: bool = False,
        collect_kv: bool = True,
    ):
        """Run layers [layer_start, layer_end] (inclusive).

        pre_layer_fn(layer_id, x) runs before each layer (glimpse-token
        residual adds). Returns (x, kv [n_run, B, S, Hkv, D] | None,
        harvests {layer_id: [B, S, Hq]}).
        """
        if layer_end is None:
            layer_end = self.cfg.num_hidden_layers - 1
        ks: List[jnp.ndarray] = []
        vs: List[jnp.ndarray] = []
        harvests: Dict[int, jnp.ndarray] = {}
        for layer_id in range(layer_start, layer_end + 1):
            if pre_layer_fn is not None:
                x = pre_layer_fn(layer_id, x)
            want_harvest = layer_id in harvest_layers
            x, k, v, row = self.layers[layer_id].prefill(
                x, cos, sin, valid,
                q_index=q_index,
                harvest=want_harvest,
                use_attention_logits=use_attention_logits,
            )
            if collect_kv:
                ks.append(k)
                vs.append(v)
            if want_harvest:
                harvests[layer_id] = row
        kv = None
        if collect_kv:
            kv = (jnp.stack(ks, axis=0), jnp.stack(vs, axis=0))
        return x, kv, harvests

    def decode_step(
        self,
        input_ids: jnp.ndarray,  # [B, S_new]
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        k_cache: jnp.ndarray,  # [L, B, T, Hkv, D]
        v_cache: jnp.ndarray,
        kv_valid: jnp.ndarray,  # [B, T] validity incl. the new slots
        write_idx: jnp.ndarray,  # scalar
    ):
        x = self.embed(input_ids)
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, kc, vc = layer.decode(
                x, cos, sin, k_cache[i], v_cache[i], kv_valid, write_idx
            )
            new_k.append(kc)
            new_v.append(vc)
        x = self.final_norm(x)
        return self.logits(x), jnp.stack(new_k, 0), jnp.stack(new_v, 0)
