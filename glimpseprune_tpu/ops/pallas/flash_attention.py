"""Pallas TPU flash attention with segment ids, causal masking, and GQA.

The hot attention kernel for both towers: the ViT's full-attention blocks
(bidirectional, per-image segments over the packed patch sequence) and the
LLM prefill (causal + left-pad validity). Online-softmax accumulators live in
VMEM scratch while K/V stream through the grid's innermost dimension, so
VMEM stays O(block) at any sequence length (an earlier whole-KV-resident
version hit the 16MB VMEM ceiling at ~14k keys). The reference leans on
flash-attn CUDA for the same memory behavior (SURVEY.md §2.9).

Layout: q [B, Hq, Sq, D], k/v [B, Hkv, Skv, D]; GQA is handled in the k/v
BlockSpec index map (q head h reads kv head h // group). Segment ids are
int32, [B, S]; attention is allowed iff equal and >= 0. D and S are padded
to block multiples by the wrapper.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LOG2E = math.log2(math.e)


def _kernel(
    qseg_ref,  # [1, bq] int32 (blocked from [B, 1, Sq]); absent when dense
    kseg_ref,  # [1, bk] int32; absent when dense
    q_ref,     # [bq, D] (bf16, or int8 under qkv_int8)
    k_ref,     # [bk, D]
    v_ref,     # [bk, D]
    o_ref,     # [bq, D]
    m_ref,     # scratch [bq, 1] f32
    l_ref,     # scratch [bq, 1] f32
    acc_ref,   # scratch [bq, D] f32
    *,
    sm_scale: float,
    causal: bool,
    bq: int,
    bk: int,
    dense: bool,
    qsc_ref=None,  # [1, bq] f32 per-row q scales (int8 path only)
    ksc_ref=None,  # [1, bk] f32 per-row k scales
    pv_int8: bool = False,
    qpos_ref=None,  # [1, bq] int32 GLOBAL q positions (sequence-parallel /
                    # chunked-prefill shards: causal masking against absolute
                    # slot indices instead of local block offsets)
    lse_ref=None,   # [1, bq] f32 out: log2-domain logsumexp per q row
                    # (m2 + log2(l)), emitted for the pallas backward pass
):
    iq = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: kv blocks strictly above the diagonal contribute nothing.
    # With explicit q positions the diagonal is dynamic (q rows are a shard
    # of a longer sequence): skip on the block's max position instead —
    # exact, since positions are sorted within the packed layouts.
    if causal and qpos_ref is not None:
        run = jnp.max(qpos_ref[:, :]) >= j * bk
    else:
        run = j * bk <= iq * bq + bq - 1 if causal else True

    if not dense:
        # Per-tile range overlap (scalar reduces over the two seg rows,
        # ~bq+bk VPU ops — noise next to the [bq, bk] tile): if the tile's q
        # and k segment ranges don't intersect, SKIP the whole tile —
        # splash-style block-diagonal sparsity, so a K-image pack pays
        # sum(S_i^2), not S^2, and all-padding tiles cost nothing. Segment
        # ids are sorted per row in the packed layouts, so the min/max range
        # test is exact, not conservative.
        qs = qseg_ref[:, :]
        ks = kseg_ref[:, :]
        overlap = (
            (jnp.max(qs) >= jnp.min(ks)) & (jnp.max(ks) >= jnp.min(qs))
            & (jnp.max(qs) >= 0) & (jnp.max(ks) >= 0)
        )
        run = run & overlap

    # MXU dots take the native (bf16) operands with f32 accumulation —
    # casting operands to f32 runs the MXU at ~1/4 peak on v5e (measured
    # 44 TF/s -> ~170 TF/s from this change alone). sm_scale applies to
    # the f32 product, not the bf16 q, so no operand precision is lost.
    # exp2 throughout: the product is pre-scaled by log2(e), so
    # exp2(s2 - m2) == exp(s - m); exp2 is the VPU's native transcendental
    # (exp lowers to exp2 plus a multiply pass over the tile).
    scale2 = sm_scale * _LOG2E

    @pl.when(run)
    def _step():
        if qsc_ref is not None:
            # int8 QK^T (serving tier): the v5e int8 MXU mode runs the dot
            # at 2x bf16 peak; the per-row symmetric scales re-enter as a
            # rank-1 f32 rescale (exact for the quantized operands)
            s = jax.lax.dot_general(
                q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = s * (qsc_ref[:, :].reshape(bq, 1) * scale2) * ksc_ref[:, :]
        else:
            s = jax.lax.dot_general(
                q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale2  # [bq, bk] f32, log2-domain
        if not dense:
            qseg_col = qseg_ref[:, :].reshape(bq, 1)
            kseg_row = kseg_ref[:, :]  # [1, bk]
            allowed = (qseg_col == kseg_row) & (qseg_col >= 0)
            if causal:
                if qpos_ref is not None:
                    q_pos_col = qpos_ref[:, :].reshape(bq, 1)
                else:
                    q_pos_col = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
                k_pos_row = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
                allowed = allowed & (q_pos_col >= k_pos_row)
            s = jnp.where(allowed, s, NEG_INF)
        elif causal:
            q_pos_col = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
            k_pos_row = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
            s = jnp.where(q_pos_col >= k_pos_row, s, NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = v_ref[:]
        if pv_int8:
            # PV on the int8 MXU mode too ("all" tier). p = exp2(s - m_new)
            # is in [0, 1] by construction, so its int8 scale is the STATIC
            # 1/127 (no amax pass); v is quantized per-COLUMN within the
            # tile (scale constant along the bk contraction dim), so both
            # scales factor out of the dot exactly — the only error is the
            # two quantization steps. The softmax denominator l stays f32.
            p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
            vf = vb.astype(jnp.float32)
            vsc = jnp.maximum(jnp.max(jnp.abs(vf), axis=0, keepdims=True),
                              1e-8) / 127.0  # [1, D]
            v_i8 = jnp.clip(jnp.round(vf / vsc), -127, 127).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8, v_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha + pv * (vsc * (1.0 / 127.0))
        else:
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_ref[:] = m_new

    @pl.when(j == nk - 1)
    def _finish():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        # rows that never saw an allowed key keep m at the floor -> zero out
        out = jnp.where(m_ref[:] > NEG_INF * 0.5, out, 0.0)
        o_ref[:] = out.astype(o_ref.dtype)
        if lse_ref is not None:
            lse = m_ref[:] + jnp.log2(jnp.maximum(l_ref[:], 1e-30))
            lse = jnp.where(m_ref[:] > NEG_INF * 0.5, lse, NEG_INF)
            lse_ref[:, :] = lse.reshape(1, bq)


def _i8_kernel_adapter(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, qsc_ref,
                       ksc_ref, o_ref, m_ref, l_ref, acc_ref, *,
                       sm_scale, causal, bq, bk, pv_int8=False):
    _kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            acc_ref, sm_scale=sm_scale, causal=causal, bq=bq, bk=bk,
            dense=False, qsc_ref=qsc_ref, ksc_ref=ksc_ref, pv_int8=pv_int8)


def _qpos_kernel_adapter(qseg_ref, kseg_ref, qpos_ref, q_ref, k_ref, v_ref,
                         o_ref, m_ref, l_ref, acc_ref, *,
                         sm_scale, causal, bq, bk):
    _kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            acc_ref, sm_scale=sm_scale, causal=causal, bq=bq, bk=bk,
            dense=False, qpos_ref=qpos_ref)


def _i8_qpos_kernel_adapter(qseg_ref, kseg_ref, qpos_ref, q_ref, k_ref, v_ref,
                            qsc_ref, ksc_ref, o_ref, m_ref, l_ref, acc_ref, *,
                            sm_scale, causal, bq, bk, pv_int8=False):
    _kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            acc_ref, sm_scale=sm_scale, causal=causal, bq=bq, bk=bk,
            dense=False, qsc_ref=qsc_ref, ksc_ref=ksc_ref, pv_int8=pv_int8,
            qpos_ref=qpos_ref)


def _i8_dense_kernel_adapter(q_ref, k_ref, v_ref, qsc_ref, ksc_ref, o_ref,
                             m_ref, l_ref, acc_ref, *, sm_scale, causal,
                             bq, bk, pv_int8=False):
    _kernel(None, None, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            sm_scale=sm_scale, causal=causal, bq=bq, bk=bk, dense=True,
            qsc_ref=qsc_ref, ksc_ref=ksc_ref, pv_int8=pv_int8)


def _lse_kernel_adapter(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref,
                        lse_ref, m_ref, l_ref, acc_ref, *,
                        sm_scale, causal, bq, bk):
    _kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            acc_ref, sm_scale=sm_scale, causal=causal, bq=bq, bk=bk,
            dense=False, lse_ref=lse_ref)


def _qpos_lse_kernel_adapter(qseg_ref, kseg_ref, qpos_ref, q_ref, k_ref,
                             v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                             sm_scale, causal, bq, bk):
    _kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            acc_ref, sm_scale=sm_scale, causal=causal, bq=bq, bk=bk,
            dense=False, qpos_ref=qpos_ref, lse_ref=lse_ref)


def _dense_lse_kernel_adapter(q_ref, k_ref, v_ref, o_ref, lse_ref,
                              m_ref, l_ref, acc_ref, *,
                              sm_scale, causal, bq, bk):
    _kernel(None, None, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            sm_scale=sm_scale, causal=causal, bq=bq, bk=bk, dense=True,
            lse_ref=lse_ref)


def _quant_rows_i8(x):
    """[B, H, S, D] -> (int8 values, f32 per-(b,h,s) scales).

    Symmetric per-row amax/127 — the scale is constant along the QK^T
    contraction dim, so it factors out of the dot exactly (rank-1 rescale
    in the kernel)."""
    amax = jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xi = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return xi, scale


def _pad_to(x, axis, mult, value=0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _reference_attention(q, k, v, q_segment_ids, kv_segment_ids, causal, sm_scale):
    """XLA einsum reference used by the backward pass (identical math)."""
    hq, hkv = q.shape[1], k.shape[1]
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=1)
        v = jnp.repeat(v, hq // hkv, axis=1)
    logits = jnp.einsum(
        "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if q_segment_ids is None:
        q_segment_ids = jnp.zeros(q.shape[:1] + q.shape[2:3], jnp.int32)
        kv_segment_ids = jnp.zeros(k.shape[:1] + k.shape[2:3], jnp.int32)
    qs = q_segment_ids[:, None, :, None]
    ks = kv_segment_ids[:, None, None, :]
    allowed = (qs == ks) & (qs >= 0)
    if causal:
        sq, skv = q.shape[2], k.shape[2]
        allowed = allowed & (
            jnp.arange(sq)[None, None, :, None] >= jnp.arange(skv)[None, None, None, :]
        )
    logits = jnp.where(allowed, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(allowed.any(-1, keepdims=True), probs, 0.0)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_attention_diff(q, k, v, qseg, kseg, causal, sm_scale, block_q, block_k,
                          interpret, dense):
    return _flash_attention_impl(q, k, v, qseg, kseg, causal=causal,
                                 sm_scale=sm_scale, block_q=block_q,
                                 block_k=block_k, interpret=interpret,
                                 dense=dense)


# "pallas": FlashAttention-2-style backward kernels (O(block) memory, the
# only path that reaches the reference's 16k-token training regime).
# "xla": recompute-and-differentiate the einsum reference — exact but
# materializes [B, Hq, Sq, Skv] f32 logits per layer (debug fallback).
FLASH_BACKWARD = "pallas"


def set_flash_backward(mode: str):
    """Select the flash vjp implementation ("pallas" | "xla").

    Binds at TRACE time: an already-jitted step function keeps the backward
    it was traced with — retrace (new jit / new shapes) to switch."""
    global FLASH_BACKWARD
    assert mode in ("pallas", "xla"), mode
    FLASH_BACKWARD = mode


def _flash_fwd(q, k, v, qseg, kseg, causal, sm_scale, block_q, block_k, interpret,
               dense):
    out, lse = _flash_attention_impl(q, k, v, qseg, kseg, causal=causal,
                                     sm_scale=sm_scale, block_q=block_q,
                                     block_k=block_k, interpret=interpret,
                                     dense=dense, return_lse=True)
    return out, (q, k, v, qseg, kseg, out, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, interpret, dense, res, g):
    q, k, v, qseg, kseg, out, lse = res
    if FLASH_BACKWARD == "pallas":
        dq, dk, dv = _flash_bwd_impl(q, k, v, qseg, kseg, out, lse, g,
                                     causal=causal, sm_scale=sm_scale,
                                     interpret=interpret)
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_attention(q_, k_, v_, qseg, kseg,
                                                    causal, sm_scale),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    import numpy as _np

    zq = _np.zeros(qseg.shape, dtype=jax.dtypes.float0)
    zk = _np.zeros(kseg.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zq, zk


_flash_attention_diff.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _flash_attention_qpos_diff(q, k, v, qseg, kseg, qpos, causal, sm_scale,
                               block_q, block_k, interpret):
    return _flash_attention_impl(q, k, v, qseg, kseg, causal=causal,
                                 sm_scale=sm_scale, block_q=block_q,
                                 block_k=block_k, interpret=interpret,
                                 dense=False, q_positions=qpos)


def _flash_qpos_fwd(q, k, v, qseg, kseg, qpos, causal, sm_scale, block_q,
                    block_k, interpret):
    out, lse = _flash_attention_impl(q, k, v, qseg, kseg, causal=causal,
                                     sm_scale=sm_scale, block_q=block_q,
                                     block_k=block_k, interpret=interpret,
                                     dense=False, q_positions=qpos,
                                     return_lse=True)
    return out, (q, k, v, qseg, kseg, qpos, out, lse)


def _flash_qpos_bwd(causal, sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, qseg, kseg, qpos, out, lse = res
    if FLASH_BACKWARD == "pallas":
        dq, dk, dv = _flash_bwd_impl(q, k, v, qseg, kseg, out, lse, g,
                                     causal=causal, sm_scale=sm_scale,
                                     interpret=interpret, q_positions=qpos)
    else:
        # the set_flash_backward("xla") debug fallback must cover this path
        # too: reference attention with the same global-position causal mask
        # (_reference_attention has no qpos arg)
        skv = k.shape[2]

        def ref_qpos(q_, k_, v_):
            hq, hkv = q_.shape[1], k_.shape[1]
            kk = jnp.repeat(k_, hq // hkv, axis=1) if hq != hkv else k_
            vv = jnp.repeat(v_, hq // hkv, axis=1) if hq != hkv else v_
            logits = jnp.einsum("bhsd,bhtd->bhst", q_, kk,
                                preferred_element_type=jnp.float32) * sm_scale
            allowed = (qseg[:, None, :, None] == kseg[:, None, None, :]) &                 (qseg >= 0)[:, None, :, None]
            if causal:
                allowed = allowed & (
                    qpos[:, None, :, None] >= jnp.arange(skv)[None, None, None, :]
                )
            logits = jnp.where(allowed, logits, NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = jnp.where(allowed.any(-1, keepdims=True), probs, 0.0)
            return jnp.einsum("bhst,bhtd->bhsd", probs.astype(vv.dtype), vv)

        _, vjp = jax.vjp(ref_qpos, q, k, v)
        dq, dk, dv = vjp(g)
    import numpy as _np

    zq = _np.zeros(qseg.shape, dtype=jax.dtypes.float0)
    zk = _np.zeros(kseg.shape, dtype=jax.dtypes.float0)
    zp = _np.zeros(qpos.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zq, zk, zp


_flash_attention_qpos_diff.defvjp(_flash_qpos_fwd, _flash_qpos_bwd)


def flash_attention(
    q, k, v, q_segment_ids, kv_segment_ids,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    dense: bool = False,
    qkv_int8: bool = False,
    pv_int8: bool = False,
    q_positions=None,
):
    """Differentiable wrapper: pallas kernel forward, XLA-reference backward
    (custom VJP — pallas_call has no autodiff rule).

    Default blocks 1024x1024: the TPU-swept optimum at both tower shapes
    (512x512 was grid-overhead-bound: 44 -> 84 TF/s on the ViT full-att
    shape, 60 -> 88 TF/s on the 16k causal LLM shape; bf16 2048-blocks
    exceed VMEM and fail to compile). Exception: int8 k tiles halve the
    VMEM footprint, so the qkv_int8 tier defaults block_k to 2048 when the
    kv sequence divides it (the %2048 guard keeps dense=True callers with
    skv in {1024k : k odd} on the dense fast path instead of silently
    demoting to the masked path). On-chip validated at the decisive
    64k-patch ViT shape (r4 ladder, [1,16,65536,80]): qk8-bk2048 compiles
    and runs 94.5 TF/s and all8-bk2048 93.7 vs bf16 91.0 and all8-bk1024
    81.7 — the bump is right for both int8 tiers, but the int8 win at the
    real operating shape is ~4% kernel-level (the 2x r3 numbers at S=8192
    were tunnel-noise-dominated). Pass block_k explicitly to override.

    dense=True is a STATIC caller promise that every position is valid and
    in one segment (single unpadded image / unpadded batch row): the kernel
    compiles with no segment refs or mask passes at all (+~9% on the ViT
    full-att shape, r3 sweep). Segment ids may be None in that case; with
    dense=False, all-padding / non-overlapping-segment tiles are skipped
    per-tile at runtime instead (block-diagonal sparsity).

    qkv_int8=True (serving tier, INFERENCE-ONLY — no vjp): q and k are
    dynamically quantized to per-row symmetric int8 and QK^T runs on the
    v5e int8 MXU mode (2x bf16 peak); the rank-1 scale rescale is exact
    for the quantized operands, so the only error is the ~1/254 per-row
    quantization step on q/k. PV stays bf16 unless pv_int8=True ("all"
    tier, requires qkv_int8): p = exp2(s - m) ∈ [0, 1] quantizes with a
    static 1/127 scale and v per-column per tile, both factoring out of
    the dot exactly — attention then runs BOTH dots at the int8 rate.

    q_positions ([B, Sq] int32): explicit GLOBAL q slot positions for
    causal masking, for callers whose q rows are a shard/chunk of a longer
    sequence (sequence-parallel prefill over a mesh axis, chunked
    prefill): causal allows k slot t iff t <= q_positions[s], where kv
    rows are the FULL sequence in slot order. Requires causal=True and
    dense=False. Differentiable (the pallas backward threads the same
    position masking) except combined with the int8 tiers."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    if block_q is None:
        block_q = 1024
    if block_k is None:
        block_k = 2048 if (qkv_int8 and k.shape[2] % 2048 == 0) else 1024
    if q_segment_ids is None:
        assert dense, "segment ids are required unless dense=True"
        q_segment_ids = jnp.zeros((q.shape[0], q.shape[2]), jnp.int32)
        kv_segment_ids = jnp.zeros((k.shape[0], k.shape[2]), jnp.int32)
    assert not (pv_int8 and not qkv_int8), "pv_int8 rides the qkv_int8 tier"
    if q_positions is not None:
        assert causal and not dense, "q_positions implies causal, non-dense"
        if qkv_int8:  # int8 serving tier stays inference-only
            return _flash_attention_impl(
                q, k, v, q_segment_ids, kv_segment_ids, causal=True,
                sm_scale=float(sm_scale), block_q=block_q, block_k=block_k,
                interpret=interpret, dense=False, qkv_int8=True,
                pv_int8=pv_int8, q_positions=q_positions)
        return _flash_attention_qpos_diff(
            q, k, v, q_segment_ids, kv_segment_ids, q_positions,
            causal, float(sm_scale), block_q, block_k, interpret)
    if qkv_int8:
        return _flash_attention_impl(
            q, k, v, q_segment_ids, kv_segment_ids, causal=causal,
            sm_scale=float(sm_scale), block_q=block_q, block_k=block_k,
            interpret=interpret, dense=dense, qkv_int8=True,
            pv_int8=pv_int8)
    return _flash_attention_diff(q, k, v, q_segment_ids, kv_segment_ids,
                                 causal, float(sm_scale), block_q, block_k,
                                 interpret, dense)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret",
                     "dense", "qkv_int8", "pv_int8", "return_lse"),
)
def _flash_attention_impl(
    q: jnp.ndarray,       # [B, Hq, Sq, D]
    k: jnp.ndarray,       # [B, Hkv, Skv, D]
    v: jnp.ndarray,
    q_segment_ids: jnp.ndarray,   # [B, Sq] int32, <0 = padding
    kv_segment_ids: jnp.ndarray,  # [B, Skv]
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
    dense: bool = False,
    qkv_int8: bool = False,
    pv_int8: bool = False,
    q_positions: Optional[jnp.ndarray] = None,  # [B, Sq] int32 global slots
    return_lse: bool = False,  # also return [B, Hq, Sq] log2-domain LSE
) -> jnp.ndarray:
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    skv = k.shape[2]
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)

    # the dense promise only holds if no block padding is introduced (pad
    # rows would be unmasked); shapes are static, so this stays compile-time
    dense = dense and sq % block_q == 0 and skv % block_k == 0

    out_dtype = q.dtype
    qsc = ksc = None
    if qkv_int8:
        q, qsc = _quant_rows_i8(q)
        k, ksc = _quant_rows_i8(k)

    d_p = d + (-d) % 128
    sq_p = sq + (-sq) % block_q
    skv_p = skv + (-skv) % block_k
    qp = _pad_to(_pad_to(q, 3, 128), 2, block_q)
    kp = _pad_to(_pad_to(k, 3, 128), 2, block_k)
    vp = _pad_to(_pad_to(v, 3, 128), 2, block_k)

    grid = (b, hq, sq_p // block_q, skv_p // block_k)
    in_specs = []
    args = []
    if return_lse:
        assert not qkv_int8, \
            "LSE emission (training backward) is bf16-path only"
    if dense:
        # no segment refs at all: the kernel body compiles with zero mask
        # passes
        if return_lse:
            base = _dense_lse_kernel_adapter
        else:
            base = _i8_dense_kernel_adapter if qkv_int8 else _dense_kernel_adapter
        kernel = functools.partial(
            base, sm_scale=sm_scale, causal=causal, bq=block_q, bk=block_k,
        )
        if qkv_int8:
            kernel = functools.partial(kernel, pv_int8=pv_int8)
    else:
        has_qpos = q_positions is not None
        if return_lse:
            base = _qpos_lse_kernel_adapter if has_qpos else _lse_kernel_adapter
        elif has_qpos:
            base = _i8_qpos_kernel_adapter if qkv_int8 else _qpos_kernel_adapter
        else:
            base = _i8_kernel_adapter if qkv_int8 else _kernel
        kernel = functools.partial(
            base, sm_scale=sm_scale, causal=causal, bq=block_q, bk=block_k,
        )
        if qkv_int8:
            kernel = functools.partial(kernel, pv_int8=pv_int8)
        elif not has_qpos and not return_lse:
            kernel = functools.partial(kernel, dense=False)
        # seg ids ride as [B, 1, S] so the blocked last-two dims are
        # (1, block): dim -2 equals the array dim (Mosaic allows block==dim),
        # dim -1 is a 128-multiple — required once B > 1 (a [B, S] layout
        # needs B % 8 == 0).
        qsp = _pad_to(q_segment_ids.astype(jnp.int32), 1, block_q, value=-1)[:, None, :]
        ksp = _pad_to(kv_segment_ids.astype(jnp.int32), 1, block_k, value=-2)[:, None, :]
        in_specs += [
            pl.BlockSpec((None, 1, block_q), lambda bi, h, iq, j: (bi, 0, iq), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k), lambda bi, h, iq, j: (bi, 0, j), memory_space=pltpu.VMEM),
        ]
        args += [qsp, ksp]
        if has_qpos:
            # global q positions ride like the q segment ids; pad rows get
            # position 0 (their outputs are sliced away, and 0 never raises
            # a tile's max-position skip bound)
            qpp = _pad_to(q_positions.astype(jnp.int32), 1, block_q)[:, None, :]
            in_specs += [
                pl.BlockSpec((None, 1, block_q), lambda bi, h, iq, j: (bi, 0, iq), memory_space=pltpu.VMEM),
            ]
            args += [qpp]
    in_specs += [
        pl.BlockSpec((None, None, block_q, d_p), lambda bi, h, iq, j: (bi, h, iq, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, iq, j: (bi, h // group, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, iq, j: (bi, h // group, j, 0), memory_space=pltpu.VMEM),
    ]
    args += [qp, kp, vp]
    if qkv_int8:
        # per-row scales ride like the segment ids, one lane-block per
        # (batch, head, q/k block): [B, H, 1, S] -> kernel ref [1, block]
        qscp = _pad_to(qsc, 2, block_q)[:, :, None, :]
        kscp = _pad_to(ksc, 2, block_k)[:, :, None, :]
        in_specs += [
            pl.BlockSpec((None, None, 1, block_q),
                         lambda bi, h, iq, j: (bi, h, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, block_k),
                         lambda bi, h, iq, j: (bi, h // group, 0, j),
                         memory_space=pltpu.VMEM),
        ]
        args += [qscp, kscp]
    out_specs = pl.BlockSpec(
        (None, None, block_q, d_p), lambda bi, h, iq, j: (bi, h, iq, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b, hq, sq_p, d_p), out_dtype)
    if return_lse:
        # LSE rides out like the int8 scales ride in: [B, H, 1, Sq]
        out_specs = [out_specs, pl.BlockSpec(
            (None, None, 1, block_q), lambda bi, h, iq, j: (bi, h, 0, iq),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, hq, 1, sq_p), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    if return_lse:
        out, lse = out
        return out[:, :, :sq, :d], lse[:, :, 0, :sq]
    return out[:, :, :sq, :d]


def _dense_kernel_adapter(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                          sm_scale, causal, bq, bk):
    _kernel(None, None, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            sm_scale=sm_scale, causal=causal, bq=bq, bk=bk, dense=True)


# --------------------------------------------------------------------- #
# FlashAttention-2-style backward pass (two pallas kernels).
#
# The forward saves (out, lse2) where lse2 = m2 + log2(l) per q row; the
# backward recomputes each [bq, bk] probability tile as
# p = exp2(s * sm_scale * log2(e) - lse2) — exactly the forward's softmax
# without a second online pass — and applies the standard identities
#   dV = P^T dO
#   dS = P o (dO V^T - D),  D = rowsum(dO o O)
#   dQ = dS K * sm_scale,   dK = dS^T Q * sm_scale
# O(S^2) appears only as one VMEM tile at a time, replacing the XLA
# recompute backward whose [B, Hq, S, S] f32 logits capped trainable
# context far below the reference's 16k-token training regime
# (train_qwen_gp.py max_pixels=12845056 + flash_attention_2).
#
# dK/dV accumulate per *q* head ([B, Hq, Skv, D]) and are group-summed to
# the GQA [B, Hkv, Skv, D] outside — one extra HBM round trip on dk/dv,
# traded for revisit-free output blocks in the kernel.


def _bwd_tile(qseg_ref, kseg_ref, q_ref, k_ref, lse_ref,
              sm_scale, causal, bq, bk, iq, jk, qpos_ref=None):
    """Recompute the masked probability tile p [bq, bk] from (q, k, lse).

    Both backward kernels always pass segment refs (the dense forward's
    zero-segment wrapper arrays mask nothing), so there is no seg-less
    variant here. qpos_ref: GLOBAL q positions (sequence-parallel shards),
    mirroring the forward's q_positions masking."""
    scale2 = sm_scale * _LOG2E
    s2 = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale2
    qseg_col = qseg_ref[:, :].reshape(bq, 1)
    kseg_row = kseg_ref[:, :]
    allowed = (qseg_col == kseg_row) & (qseg_col >= 0)
    if causal:
        if qpos_ref is not None:
            q_pos = qpos_ref[:, :].reshape(bq, 1)
        else:
            q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        allowed = allowed & (q_pos >= k_pos)
    s2 = jnp.where(allowed, s2, NEG_INF)
    lse_col = lse_ref[:, :].reshape(bq, 1)
    p = jnp.exp2(s2 - lse_col)
    # rows that never saw an allowed key carry lse = NEG_INF: p must be 0,
    # not exp2(NEG_INF - NEG_INF) = 1
    p = jnp.where(lse_col > NEG_INF * 0.5, p, 0.0)
    return p


def _bwd_dq_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   dsum_ref, dq_ref, dq_acc, *, sm_scale, causal, bq, bk,
                   qpos_ref=None):
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(jk == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if causal and qpos_ref is not None:
        run = jnp.max(qpos_ref[:, :]) >= jk * bk
    else:
        run = jk * bk <= iq * bq + bq - 1 if causal else True
    if qseg_ref is not None:
        qs = qseg_ref[:, :]
        ks = kseg_ref[:, :]
        run = run & (
            (jnp.max(qs) >= jnp.min(ks)) & (jnp.max(ks) >= jnp.min(qs))
            & (jnp.max(qs) >= 0) & (jnp.max(ks) >= 0)
        )

    @pl.when(run)
    def _step():
        p = _bwd_tile(qseg_ref, kseg_ref, q_ref, k_ref, lse_ref,
                      sm_scale, causal, bq, bk, iq, jk, qpos_ref=qpos_ref)
        dp = jax.lax.dot_general(
            do_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        ds = p * (dp - dsum_ref[:, :].reshape(bq, 1))
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale

    @pl.when(jk == nk - 1)
    def _finish():
        dq_ref[:] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                    dsum_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    sm_scale, causal, bq, bk, qpos_ref=None):
    jk = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    if causal and qpos_ref is not None:
        run = jnp.max(qpos_ref[:, :]) >= jk * bk
    else:
        run = iq * bq + bq - 1 >= jk * bk if causal else True
    if qseg_ref is not None:
        qs = qseg_ref[:, :]
        ks = kseg_ref[:, :]
        run = run & (
            (jnp.max(qs) >= jnp.min(ks)) & (jnp.max(ks) >= jnp.min(qs))
            & (jnp.max(qs) >= 0) & (jnp.max(ks) >= 0)
        )

    @pl.when(run)
    def _step():
        p = _bwd_tile(qseg_ref, kseg_ref, q_ref, k_ref, lse_ref,
                      sm_scale, causal, bq, bk, iq, jk, qpos_ref=qpos_ref)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, D]
        dp = jax.lax.dot_general(
            do_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dsum_ref[:, :].reshape(bq, 1))
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_qpos_adapter(qseg_ref, kseg_ref, qpos_ref, q_ref, k_ref, v_ref,
                         do_ref, lse_ref, dsum_ref, dq_ref, dq_acc, *,
                         sm_scale, causal, bq, bk):
    _bwd_dq_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   dsum_ref, dq_ref, dq_acc, sm_scale=sm_scale, causal=causal,
                   bq=bq, bk=bk, qpos_ref=qpos_ref)


def _bwd_dkv_qpos_adapter(qseg_ref, kseg_ref, qpos_ref, q_ref, k_ref, v_ref,
                          do_ref, lse_ref, dsum_ref, dk_ref, dv_ref, dk_acc,
                          dv_acc, *, sm_scale, causal, bq, bk):
    _bwd_dkv_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                    dsum_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                    sm_scale=sm_scale, causal=causal, bq=bq, bk=bk,
                    qpos_ref=qpos_ref)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret"),
)
def _flash_bwd_impl(q, k, v, q_segment_ids, kv_segment_ids, out, lse, g,
                    causal, sm_scale, block_q=512, block_k=512,
                    interpret=False, q_positions=None):
    """Pallas backward: returns (dq, dk, dv) with dk/dv at GQA [B, Hkv]."""
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    skv = k.shape[2]
    group = hq // hkv

    # D = rowsum(dO o O) per q row — one cheap fused XLA pass
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    d_p = d + (-d) % 128
    sq_p = sq + (-sq) % block_q
    skv_p = skv + (-skv) % block_k
    qp = _pad_to(_pad_to(q, 3, 128), 2, block_q)
    kp = _pad_to(_pad_to(k, 3, 128), 2, block_k)
    vp = _pad_to(_pad_to(v, 3, 128), 2, block_k)
    gp = _pad_to(_pad_to(g, 3, 128), 2, block_q)
    # pad rows mask out via segments; their lse pads to NEG_INF -> p = 0
    qsp = _pad_to(q_segment_ids.astype(jnp.int32), 1, block_q, value=-1)[:, None, :]
    ksp = _pad_to(kv_segment_ids.astype(jnp.int32), 1, block_k, value=-2)[:, None, :]
    lsep = _pad_to(lse.astype(jnp.float32), 2, block_q, value=NEG_INF)[:, :, None, :]
    dsump = _pad_to(dsum, 2, block_q)[:, :, None, :]
    has_qpos = q_positions is not None
    qpp = (_pad_to(q_positions.astype(jnp.int32), 1, block_q)[:, None, :]
           if has_qpos else None)
    qpos_spec_dq = pl.BlockSpec((None, 1, block_q),
                                lambda bi, h, x, y: (bi, 0, x),
                                memory_space=pltpu.VMEM)
    qpos_spec_dkv = pl.BlockSpec((None, 1, block_q),
                                 lambda bi, h, y, x: (bi, 0, x),
                                 memory_space=pltpu.VMEM)

    # ---- dq: grid (b, hq, iq, jk), jk innermost
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_qpos_adapter if has_qpos else _bwd_dq_kernel,
            sm_scale=sm_scale, causal=causal, bq=block_q, bk=block_k),
        grid=(b, hq, sq_p // block_q, skv_p // block_k),
        in_specs=[
            pl.BlockSpec((None, 1, block_q), lambda bi, h, x, y: (bi, 0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k), lambda bi, h, x, y: (bi, 0, y), memory_space=pltpu.VMEM),
        ] + ([qpos_spec_dq] if has_qpos else []) + [
            pl.BlockSpec((None, None, block_q, d_p), lambda bi, h, x, y: (bi, h, x, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, x, y: (bi, h // group, y, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, x, y: (bi, h // group, y, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d_p), lambda bi, h, x, y: (bi, h, x, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, block_q), lambda bi, h, x, y: (bi, h, 0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, block_q), lambda bi, h, x, y: (bi, h, 0, x), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, block_q, d_p), lambda bi, h, x, y: (bi, h, x, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d_p), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*([qsp, ksp] + ([qpp] if has_qpos else [])
        + [qp, kp, vp, gp, lsep, dsump]))[:, :, :sq, :d]

    # ---- dk/dv: grid (b, hq, jk, iq), iq innermost
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_qpos_adapter if has_qpos else _bwd_dkv_kernel,
            sm_scale=sm_scale, causal=causal, bq=block_q, bk=block_k),
        grid=(b, hq, skv_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((None, 1, block_q), lambda bi, h, y, x: (bi, 0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k), lambda bi, h, y, x: (bi, 0, y), memory_space=pltpu.VMEM),
        ] + ([qpos_spec_dkv] if has_qpos else []) + [
            pl.BlockSpec((None, None, block_q, d_p), lambda bi, h, y, x: (bi, h, x, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, y, x: (bi, h // group, y, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, y, x: (bi, h // group, y, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d_p), lambda bi, h, y, x: (bi, h, x, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, block_q), lambda bi, h, y, x: (bi, h, 0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, block_q), lambda bi, h, y, x: (bi, h, 0, x), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, y, x: (bi, h, y, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_k, d_p), lambda bi, h, y, x: (bi, h, y, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, skv_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((b, hq, skv_p, d_p), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_p), jnp.float32),
            pltpu.VMEM((block_k, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*([qsp, ksp] + ([qpp] if has_qpos else [])
        + [qp, kp, vp, gp, lsep, dsump]))
    dk = dk[:, :, :skv, :d]
    dv = dv[:, :, :skv, :d]
    if group > 1:
        # GQA: sum the per-q-head dk/dv over each group
        dk = dk.reshape(b, hkv, group, skv, d).sum(axis=2)
        dv = dv.reshape(b, hkv, group, skv, d).sum(axis=2)
    return dq, dk, dv
