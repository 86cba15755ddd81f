"""Attention primitives: segment (block-diagonal) and causal GQA attention.

XLA-einsum reference paths with fp32 softmax; the Pallas flash/splash kernels
in ops/pallas/ plug in behind the same signatures for large shapes. Block-
diagonal masks are encoded as per-position segment ids (attend iff equal and
nonnegative) — the TPU-friendly encoding of the reference's cu_seqlens loops
(reference model_gp.py:140-142 builds the boolean mask with a Python loop).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30

# "auto": Pallas flash kernel on TPU for sequences >= _FLASH_MIN_SEQ,
# einsum elsewhere. "xla" / "flash" force one path; "flash_interpret" runs
# the kernel in pallas interpret mode (CPU equivalence tests).
ATTENTION_IMPL = "auto"
_FLASH_MIN_SEQ = 512


def set_attention_impl(impl: str):
    global ATTENTION_IMPL
    assert impl in ("auto", "xla", "flash", "flash_interpret"), impl
    ATTENTION_IMPL = impl


def _use_flash(seq_len: int) -> bool:
    if ATTENTION_IMPL == "xla":
        return False
    if ATTENTION_IMPL in ("flash", "flash_interpret"):
        return True
    return jax.default_backend() == "tpu" and seq_len >= _FLASH_MIN_SEQ


# ---------------------------------------------------------------------- #
# Sequence (context) parallelism: shard the PREFILL sequence dim over a
# mesh axis so one long-context request scales across chips — the "sp" in
# dp/tp/sp. The reference has no analogue (DDP only, SURVEY.md §2.8); on
# TPU it is shard_map over ICI: window attention shards with ZERO
# collectives (windows are independent), full/causal attention keeps Q
# local and all-gathers the (much smaller, GQA) K/V once per layer.
# Causal masking under a sharded Q uses the flash kernel's q_positions
# path (global slot indices). Everything outside these choke points is
# sequence-pointwise or weight matmuls, which GSPMD partitions from the
# shard_map boundary shardings automatically — enabling SP therefore
# needs no model-code changes (mirrors parallel.shard_params).
#
# Scope: prefill (serving AND training — the q_positions flash path has a
# FlashAttention-2-style custom vjp; only the int8 serving tiers remain
# inference-only).

_SP_CTX: Optional[tuple] = None  # (Mesh, axis_name)


def set_sequence_parallel(mesh, axis_name: str = "data"):
    """Enable (mesh given) / disable (None) sequence-parallel attention.

    Use parallel.sequence_parallel(...) for the context-manager form.

    The setting binds at TRACE time: a function jitted while SP was off
    keeps its cached non-SP executable afterwards (and vice versa) — set
    SP before constructing the runner / tracing the step function.
    GlimpsePruneRunner warns if the setting changes under it."""
    global _SP_CTX
    if mesh is None:
        _SP_CTX = None
        return
    assert axis_name in mesh.shape, (
        f"sequence_parallel axis {axis_name!r} not in mesh axes "
        f"{tuple(mesh.shape)}"
    )
    _SP_CTX = (mesh, axis_name)


def get_sequence_parallel() -> Optional[tuple]:
    """The active (mesh, axis_name) SP context, or None."""
    return _SP_CTX


def _sp_split(total: int, multiple: int = 1):
    """(mesh, axis, n) when SP is on and `total` splits into n equal
    `multiple`-aligned shards; None otherwise (caller falls back)."""
    if _SP_CTX is None:
        return None
    mesh, axis = _SP_CTX
    n = mesh.shape[axis]
    if n <= 1 or total % (n * multiple) != 0:
        return None
    return mesh, axis, n


# Module-level shard_map bodies (bound statics lead) + a cached jit
# factory: the jit cache is per function OBJECT, so building
# jit(shard_map(closure)) per call would recompile every eager call
# (CLAUDE.md rule). One jitted program is cached per (kind, mesh, axis,
# statics); inside the runner's jitted phases it inlines into the outer
# trace either way. The jit wrapper itself exists because partial-manual
# shard_map (axis_names a strict subset of the mesh axes) only traces
# under jit — the eager path rejects specs over the auto axes.


def _sp_segment_local(use_flash, interpret, dense, int8_qk, int8_pv, axis,
                      q, k, v, seg):
    kg = jax.lax.all_gather(k, axis, axis=0, tiled=True)
    vg = jax.lax.all_gather(v, axis, axis=0, tiled=True)
    sg = jax.lax.all_gather(seg, axis, axis=0, tiled=True)
    if use_flash:
        from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

        out = flash_attention(
            q.transpose(1, 0, 2)[None], kg.transpose(1, 0, 2)[None],
            vg.transpose(1, 0, 2)[None], seg[None], sg[None],
            causal=False, interpret=interpret, dense=dense,
            qkv_int8=int8_qk, pv_int8=int8_qk and int8_pv,
        )
        return out[0].transpose(1, 0, 2)
    allowed = (seg[:, None] == sg[None, :]) & (sg >= 0)[None, :]
    # the XLA path's pad-row self-attention, on GLOBAL indices
    sl = q.shape[0]
    gidx = jax.lax.axis_index(axis) * sl + jnp.arange(sl)
    eye = gidx[:, None] == jnp.arange(sg.shape[0])[None, :]
    allowed = allowed | eye
    out = _softmax_attend(q.transpose(1, 0, 2)[None],
                          kg.transpose(1, 0, 2)[None],
                          vg.transpose(1, 0, 2)[None],
                          allowed[None, None])
    return out[0].transpose(1, 0, 2)


def _sp_causal_local(use_flash, interpret, int8_qk, int8_pv, axis,
                     q, k, v, valid_q):
    kg = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)
    vgl = jax.lax.all_gather(valid_q, axis, axis=1, tiled=True)
    sl = q.shape[1]
    qpos = jax.lax.axis_index(axis) * sl + jnp.arange(sl)
    if use_flash:
        from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

        seg_q = jnp.where(valid_q, 0, -1).astype(jnp.int32)
        seg_k = jnp.where(vgl, 0, -1).astype(jnp.int32)
        out = flash_attention(
            q.transpose(0, 2, 1, 3), kg.transpose(0, 2, 1, 3),
            vg.transpose(0, 2, 1, 3), seg_q, seg_k, causal=True,
            interpret=interpret,
            qkv_int8=int8_qk, pv_int8=int8_qk and int8_pv,
            q_positions=jnp.broadcast_to(qpos, (q.shape[0], sl)),
        )
        return out.transpose(0, 2, 1, 3)
    t = kg.shape[1]
    hq = q.shape[2]
    causal = qpos[:, None] >= jnp.arange(t)[None, :]  # [sl, T]
    allowed = causal[None] & vgl[:, None, :]  # [B, sl, T]
    out = _softmax_attend(q.transpose(0, 2, 1, 3), _expand_kv(kg, hq),
                          _expand_kv(vg, hq), allowed[:, None])
    return out.transpose(0, 2, 1, 3)


def _sp_window_local(wp, q, k, v, valid):
    return _batched_window_attention_impl(q, k, v, valid, wp)


def _sp_fused_local(wp, qkv, cos, sin, valid):
    return _fused_window_attention_impl(qkv, cos, sin, valid, wp)


@functools.lru_cache(maxsize=128)
def _sp_jit(kind: str, mesh, axis: str, statics: tuple):
    if kind == "segment":
        fn = functools.partial(_sp_segment_local, *statics, axis)
        in_specs, out_specs = (P(axis),) * 4, P(axis)
    elif kind == "causal":
        fn = functools.partial(_sp_causal_local, *statics, axis)
        in_specs, out_specs = (P(None, axis),) * 4, P(None, axis)
    elif kind == "window":
        fn = functools.partial(_sp_window_local, *statics)
        in_specs, out_specs = (P(axis),) * 4, P(axis)
    else:  # fused
        fn = functools.partial(_sp_fused_local, *statics)
        in_specs, out_specs = (P(axis),) * 4, P(axis)
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, axis_names={axis},
                                 check_vma=False))


def _softmax_attend(
    q: jnp.ndarray,  # [B, Hq, S, D]
    k: jnp.ndarray,  # [B, Hq, T, D]
    v: jnp.ndarray,  # [B, Hq, T, D]
    allowed: jnp.ndarray,  # [B, 1|Hq, S, T] bool
) -> jnp.ndarray:
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(allowed, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v)
    return out


def _expand_kv(k: jnp.ndarray, num_q_heads: int) -> jnp.ndarray:
    """[B, T, Hkv, D] -> [B, Hq, T, D] by repeating each kv head."""
    b, t, hkv, d = k.shape
    groups = num_q_heads // hkv
    k = jnp.repeat(k, groups, axis=2)
    return k.transpose(0, 2, 1, 3)


def segment_attention(
    q: jnp.ndarray,  # [S, H, D]   (packed sequence, no batch)
    k: jnp.ndarray,  # [S, H, D]
    v: jnp.ndarray,  # [S, H, D]
    segment_ids: jnp.ndarray,  # [S] int; attend iff equal; <0 = padding
    dense: bool = False,
    int8_qk: bool = False,
    int8_pv: bool = False,
) -> jnp.ndarray:
    """Bidirectional block-diagonal attention for the packed ViT sequence.

    dense=True is a STATIC host-side promise that the whole sequence is one
    valid segment (single unpadded image): the flash kernel then compiles
    with no segment masking at all (+~9% at the 64k-patch bench shape).
    int8_qk=True (serving tier, inference-only) runs QK^T on the int8 MXU
    mode at flash sizes; the XLA fallback below the flash threshold stays
    bf16 (numerically the tier is per-row-quantized q/k only). int8_pv
    extends the tier to the PV dot (static-1/127 p + per-column v).

    Under sequence parallelism (set_sequence_parallel) the packed dim
    shards over the mesh axis: Q/segments stay local, K/V all-gather once.
    Each impl's padding-row convention is preserved shard-locally, so SP
    output == single-device output bit-for-bit per impl."""
    sp = _sp_split(q.shape[0])
    if sp is not None:
        mesh, axis, n = sp
        statics = (_use_flash(q.shape[0]),  # decide on the GLOBAL length
                   ATTENTION_IMPL == "flash_interpret", dense,
                   int8_qk, int8_pv)
        return _sp_jit("segment", mesh, axis, statics)(q, k, v, segment_ids)
    if _use_flash(q.shape[0]):
        from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

        seg = segment_ids[None]
        out = flash_attention(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None], seg, seg, causal=False,
            interpret=ATTENTION_IMPL == "flash_interpret", dense=dense,
            qkv_int8=int8_qk, pv_int8=int8_qk and int8_pv,
        )
        return out[0].transpose(1, 0, 2)
    allowed = (segment_ids[:, None] == segment_ids[None, :]) & (segment_ids >= 0)[:, None]
    # padding rows attend to themselves only to keep softmax well-defined
    eye = jnp.eye(q.shape[0], dtype=bool)
    allowed = allowed | eye
    qb = q.transpose(1, 0, 2)[None]  # [1, H, S, D]
    kb = k.transpose(1, 0, 2)[None]
    vb = v.transpose(1, 0, 2)[None]
    out = _softmax_attend(qb, kb, vb, allowed[None, None])
    return out[0].transpose(1, 0, 2)


def batched_window_attention(
    q: jnp.ndarray,  # [P, H, D]   P = n_windows * wp (window-padded layout)
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,  # [P] bool
    wp: int,
) -> jnp.ndarray:
    """Dense attention within fixed-size windows: [n_win, wp] batched matmuls.

    The TPU-native form of the ViT's windowed attention — no [P, P] mask, the
    window dimension maps straight onto the MXU. Pad slots attend to
    themselves only (identity) so softmax stays defined.

    Under sequence parallelism whole windows shard over the mesh axis with
    ZERO collectives (windows never attend across themselves).
    """
    sp = _sp_split(q.shape[0], multiple=wp)
    if sp is not None:
        mesh, axis, _ = sp
        return _sp_jit("window", mesh, axis, (wp,))(q, k, v, valid)
    return _batched_window_attention_impl(q, k, v, valid, wp)


def _batched_window_attention_impl(q, k, v, valid, wp: int):
    p, h, d = q.shape
    nw = p // wp
    if ATTENTION_IMPL != "xla" and (
        ATTENTION_IMPL == "flash_interpret" or jax.default_backend() == "tpu"
    ):
        # fused Pallas kernel: one VMEM-resident program per window (the XLA
        # einsum path is latency-bound: ~15ms over the ViT for ~2 GFLOP)
        from glimpseprune_tpu.ops.pallas.window_attention import window_attention

        return window_attention(
            q, k, v, valid, wp, interpret=ATTENTION_IMPL == "flash_interpret"
        )
    # layout-preserving einsums: stay in [nw, wp, H, D] end to end (six
    # explicit transposes per block cost ~3ms across the ViT at bench shapes)
    qw = q.reshape(nw, wp, h, d)
    kw = k.reshape(nw, wp, h, d)
    vw = v.reshape(nw, wp, h, d)
    vmask = valid.reshape(nw, wp)
    allowed = vmask[:, None, :] | jnp.eye(wp, dtype=bool)[None]  # [nw, wp, wp]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("wqhd,wkhd->whqk", qw, kw,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(allowed[:, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("whqk,wkhd->wqhd", probs.astype(vw.dtype), vw)
    return out.reshape(p, h, d)


def fused_window_attention(
    qkv: jnp.ndarray,    # [P, 3, H, D] qkv-projection output, pre-rope
    cos: jnp.ndarray,    # [P, D]
    sin: jnp.ndarray,    # [P, D]
    valid: jnp.ndarray,  # [P] bool
    wp: int,
) -> jnp.ndarray:
    """Rope + windowed attention in one pass -> [P, H, D].

    TPU: one fused pallas program per window consuming the qkv matmul output
    in natural layout (the unfused path's q/k/v HBM transposes + separate
    rope passes cost ~22ms/block at 64k patches vs 6ms of attention math).
    XLA fallback unpacks and runs the reference path.

    Under sequence parallelism whole windows (and their rope rows) shard
    over the mesh axis with zero collectives."""
    sp = _sp_split(qkv.shape[0], multiple=wp)
    if sp is not None:
        mesh, axis, _ = sp
        return _sp_jit("fused", mesh, axis, (wp,))(qkv, cos, sin, valid)
    return _fused_window_attention_impl(qkv, cos, sin, valid, wp)


def _fused_window_attention_impl(qkv, cos, sin, valid, wp: int):
    if ATTENTION_IMPL != "xla" and (
        ATTENTION_IMPL == "flash_interpret" or jax.default_backend() == "tpu"
    ):
        from glimpseprune_tpu.ops.pallas.window_attention import (
            window_attention_fused,
        )

        return window_attention_fused(
            qkv, cos, sin, valid, wp, interpret=ATTENTION_IMPL == "flash_interpret"
        )
    from glimpseprune_tpu.ops.rope import apply_rotary

    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q = apply_rotary(q[None], cos[None].astype(q.dtype), sin[None].astype(q.dtype))[0]
    k = apply_rotary(k[None], cos[None].astype(k.dtype), sin[None].astype(k.dtype))[0]
    return _batched_window_attention_impl(q, k, v, valid, wp)


def causal_segment_attention(
    q: jnp.ndarray,  # [B, S, Hq, D]
    k: jnp.ndarray,  # [B, S, Hkv, D]
    v: jnp.ndarray,  # [B, S, Hkv, D]
    valid: jnp.ndarray,  # [B, S] bool (padding mask)
    int8_qk: bool = False,
    int8_pv: bool = False,
) -> jnp.ndarray:
    """Causal GQA self-attention over a (possibly left-padded) batch.
    int8_qk / int8_pv: see segment_attention (serving tier, inference-only).

    Under sequence parallelism the sequence dim shards over the mesh axis:
    Q local, K/V all-gathered (GQA keeps the gather Hkv/Hq the size of Q's),
    causal masking against GLOBAL slot positions via the flash kernel's
    q_positions path (differentiable — its own pallas backward) or the XLA
    mask. Padding semantics are position-based (absolute slots), identical
    to the unsharded paths."""
    b, s, hq, d = q.shape
    sp = _sp_split(s)
    if sp is not None:
        mesh, axis, n = sp
        statics = (_use_flash(s),  # decide on the GLOBAL length
                   ATTENTION_IMPL == "flash_interpret", int8_qk, int8_pv)
        return _sp_jit("causal", mesh, axis, statics)(q, k, v, valid)
    if _use_flash(s):
        from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

        seg = jnp.where(valid, 0, -1).astype(jnp.int32)
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), seg, seg, causal=True,
            interpret=ATTENTION_IMPL == "flash_interpret",
            qkv_int8=int8_qk, pv_int8=int8_qk and int8_pv,
        )
        return out.transpose(0, 2, 1, 3)
    causal = jnp.tril(jnp.ones((s, s), dtype=bool))
    allowed = causal[None] & valid[:, None, :]  # [B, S, T]
    qb = q.transpose(0, 2, 1, 3)
    kb = _expand_kv(k, hq)
    vb = _expand_kv(v, hq)
    out = _softmax_attend(qb, kb, vb, allowed[:, None])
    return out.transpose(0, 2, 1, 3)


def decode_attention(
    q: jnp.ndarray,  # [B, S_new, Hq, D]
    k_cache: jnp.ndarray,  # [B, T, Hkv, D]
    v_cache: jnp.ndarray,  # [B, T, Hkv, D]
    kv_valid: jnp.ndarray,  # [B, T] bool
    k_new: Optional[jnp.ndarray] = None,  # [B, S_new, Hkv, D]
    v_new: Optional[jnp.ndarray] = None,
    write_idx: Optional[jnp.ndarray] = None,  # scalar: new tokens' cache slot
    new_valid: Optional[jnp.ndarray] = None,  # [B, S_new] in-register key
    # validity — chunked prefill over LEFT-padded rows carries pad slots
    # inside the chunk; decode steps (all-real tokens) leave this None
) -> jnp.ndarray:
    """Attention of new queries over a cached (compacted) KV prefix.

    Two modes:
    - k_new/v_new given (the decode hot path): the cache holds ONLY the
      prefix — slots >= write_idx are masked as stale — and the new tokens'
      keys/values contribute from registers (causal among themselves).
      This lets the decode layer read the cache BEFORE writing it: XLA's
      copy insertion gives a while-loop carry that is dynamically read
      after an in-body update a full defensive copy (one whole KV cache of
      HBM), but read-then-write aliases clean.
    - legacy (k_new None): new queries come causally after everything valid
      in the cache; if S_new > 1, the last S_new cache slots are the new
      tokens and causal ordering among them is enforced.
    """
    b, s_new, hq, d = q.shape
    # int8 cache tier (ops/kv_cache.py): {"q": int8, "s": f32 per-token-head
    # amax/127}. The scale is constant along each matmul's contraction dim,
    # so dequant factors out of both dots exactly — no bf16 materialization
    kq = isinstance(k_cache, dict)
    k_vals = k_cache["q"] if kq else k_cache
    v_vals = v_cache["q"] if kq else v_cache
    t = k_vals.shape[1]
    hkv = k_vals.shape[2]
    g = hq // hkv
    allowed = kv_valid[:, None, :]  # [B, 1, T]
    if k_new is None and s_new > 1:
        # positions t - s_new + i may attend up to t - s_new + i
        offs = t - s_new + jnp.arange(s_new)
        causal = jnp.arange(t)[None, :] <= offs[:, None]  # [S_new, T]
        allowed = allowed & causal[None]
    if k_new is not None:
        assert write_idx is not None
        stale = jnp.arange(t)[None, None, :] >= write_idx  # [1, 1, T]
        allowed = allowed & ~stale
    # grouped GQA einsum: the cache is read ONCE per step — materializing a
    # repeat to Hq heads costs (Hq/Hkv)x the KV bytes in HBM traffic, which
    # dominated long-context decode (16k ctx, 7B: 47ms/step -> ~13ms/step)
    qg = q.reshape(b, s_new, hkv, g, d)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum(
        "bskgd,btkd->bkgst", qg, k_vals.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if kq:
        logits = logits * k_cache["s"].transpose(0, 2, 1)[:, :, None, None, :]
    logits = jnp.where(allowed[:, None, None], logits, NEG_INF)
    if k_new is None:
        probs = jax.nn.softmax(logits, axis=-1)
        if kq:
            probs = probs * v_cache["s"].transpose(0, 2, 1)[:, :, None, None, :]
        out = jnp.einsum(
            "bkgst,btkd->bskgd", probs.astype(q.dtype), v_vals.astype(q.dtype)
        )
        return out.reshape(b, s_new, hq, d)
    # append the in-register new tokens: [B, Hkv, g, S_new, S_new] causal
    logits_n = jnp.einsum(
        "bskgd,bukd->bkgsu", qg, k_new, preferred_element_type=jnp.float32
    ) * scale
    causal_n = (
        jnp.arange(s_new)[:, None] >= jnp.arange(s_new)[None, :]
    )  # query s attends new-token u iff u <= s
    logits_n = jnp.where(causal_n[None, None, None], logits_n, NEG_INF)
    if new_valid is not None:
        logits_n = jnp.where(
            new_valid[:, None, None, None, :], logits_n, NEG_INF)
    full = jnp.concatenate([logits, logits_n], axis=-1)
    probs = jax.nn.softmax(full, axis=-1)
    pc, pn = probs[..., :t], probs[..., t:]
    if kq:
        pc = pc * v_cache["s"].transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bkgst,btkd->bskgd", pc.astype(q.dtype), v_vals.astype(q.dtype))
    out = out + jnp.einsum("bkgsu,bukd->bskgd", pn.astype(v_new.dtype), v_new)
    return out.reshape(b, s_new, hq, d)
