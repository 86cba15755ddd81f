"""Quantized decode KV cache (int8 per-token-per-head symmetric).

The decode cache's HBM residency is what caps the feasible serving batch on
a 16 GB chip (reference regime: 16k-token contexts -> 0.94 GB/row at 7B
bf16). This tier stores the cache as the pytree

    {"q": int8 [L, B, T, Hkv, D], "s": f32 [L, B, T, Hkv]}

with s = amax(|kv|, axis=-1)/127 per (layer, row, token, head). Because the
scale is constant along the contraction dim of BOTH decode matmuls, the
dequant factors out exactly:

    q @ K^T      -> (q @ K_q^T) * s[t]          (scale applied to logits)
    probs @ V    -> (probs * s[t]) @ V_q        (scale folded into probs)

so attention math is bit-identical to dequantize-then-attend, with no bf16
cache materialization. Prefill attention is full-precision; quantization
happens once at cache build (prefill KV -> cache) and per step at append.

The reference has no analogue (HF fp16 cache, llava builder only quantizes
weights); this is the TPU-serving capacity knob the SURVEY §5 long-context
strategy calls for.

All helpers accept either a plain ndarray cache (model-dtype tier) or the
quantized pytree, so decode code paths are layout-agnostic.
"""

from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp

CacheT = Union[jnp.ndarray, dict]


def is_quantized(cache: Any) -> bool:
    return isinstance(cache, dict)


def quantize_kv(kv: jnp.ndarray):
    """bf16 [..., D] -> (int8 [..., D], f32 scale [...]).

    The amax reduction runs in kv's own dtype (abs/max are exact in bf16)
    so the f32 upcast appears only inside the elementwise quant chain —
    sharing `kv.astype(f32)` between the two passes makes XLA materialize
    a full f32 copy of the prefix (2x cache bytes of temp at cache build,
    enough to OOM a max-batch serving assembly)."""
    amax = jnp.max(jnp.abs(kv), axis=-1).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(kv.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def alloc_cache(shape, dtype, quant: str) -> CacheT:
    """shape = (L, B, T, Hkv, D)."""
    if quant == "int8":
        return {
            "q": jnp.zeros(shape, jnp.int8),
            "s": jnp.zeros(shape[:-1], jnp.float32),
        }
    return jnp.zeros(shape, dtype)


def cache_set_prefix(cache: CacheT, kv: jnp.ndarray, start: int = 0) -> CacheT:
    """Write a bf16 prefix [L, B, R, Hkv, D] into slots [start, start+R)."""
    r = kv.shape[2]
    if is_quantized(cache):
        q, s = quantize_kv(kv)
        return {
            "q": cache["q"].at[:, :, start : start + r].set(q),
            "s": cache["s"].at[:, :, start : start + r].set(s),
        }
    return cache.at[:, :, start : start + r].set(kv.astype(cache.dtype))


def cache_fill_rows(cache: CacheT, kv: jnp.ndarray, b0) -> CacheT:
    """Write a bf16 chunk [L, Bc, S, Hkv, D] at batch offset b0 (serving
    assembly: prefill chunks -> one decode batch). jit-friendly (b0 traced);
    pads nothing — kv's S must be <= cache T."""
    z = jnp.int32(0)
    if is_quantized(cache):
        q, s = quantize_kv(kv)
        return {
            "q": jax.lax.dynamic_update_slice(cache["q"], q, (z, b0, z, z, z)),
            "s": jax.lax.dynamic_update_slice(cache["s"], s, (z, b0, z, z)),
        }
    return jax.lax.dynamic_update_slice(
        cache, kv.astype(cache.dtype), (z, b0, z, z, z)
    )


def cache_layer(cache: CacheT, l) -> CacheT:
    """Dynamic-index layer l: [L, B, T, Hkv, D] -> [B, T, Hkv, D] (pytree)."""
    if is_quantized(cache):
        return {
            "q": jax.lax.dynamic_index_in_dim(cache["q"], l, axis=0, keepdims=False),
            "s": jax.lax.dynamic_index_in_dim(cache["s"], l, axis=0, keepdims=False),
        }
    return jax.lax.dynamic_index_in_dim(cache, l, axis=0, keepdims=False)


def cache_append(cache: CacheT, kv_new: jnp.ndarray, l, write_idx) -> CacheT:
    """Write the new tokens' bf16 kv [B, S_new, Hkv, D] into layer l at
    write_idx (decode hot path; caller orders this AFTER the cache read so
    XLA's copy insertion aliases the carry — see language._layer_decode)."""
    z = jnp.int32(0)
    if is_quantized(cache):
        q, s = quantize_kv(kv_new)
        return {
            "q": jax.lax.dynamic_update_slice(
                cache["q"], q[None], (l, z, write_idx, z, z)),
            "s": jax.lax.dynamic_update_slice(
                cache["s"], s[None], (l, z, write_idx, z)),
        }
    return jax.lax.dynamic_update_slice(
        cache, kv_new[None].astype(cache.dtype), (l, z, write_idx, z, z))


def cache_t(cache: CacheT) -> int:
    return (cache["q"] if is_quantized(cache) else cache).shape[2]


def cache_nbytes(cache: CacheT) -> int:
    leaves = jax.tree.leaves(cache)
    return sum(int(l.size) * l.dtype.itemsize for l in leaves)
