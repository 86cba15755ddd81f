"""Pallas TPU flash attention with segment ids, causal masking, and GQA.

The hot attention kernel for both towers: the ViT's full-attention blocks
(bidirectional, per-image segments over the packed patch sequence) and the
LLM prefill (causal + left-pad validity). Online-softmax streaming over KV
blocks keeps memory at O(block) instead of materializing [S, S] logits —
the reference leans on flash-attn CUDA for the same reason (SURVEY.md §2.9).

Layout: q [B, Hq, Sq, D], k/v [B, Hkv, Skv, D]; GQA is handled in the k/v
BlockSpec index map (q head h reads kv head h // group). Segment ids are
int32, [B, S]; attention is allowed iff equal and >= 0. D and S must be
multiples of 128 (wrappers pad).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    qseg_ref,  # [1, bq] int32   (SMEM-ish small VMEM block)
    kseg_ref,  # [1, Skv] int32
    q_ref,     # [bq, D]
    k_ref,     # [Skv, D]
    v_ref,     # [Skv, D]
    o_ref,     # [bq, D]
    *,
    sm_scale: float,
    block_k: int,
    causal: bool,
    bq: int,
):
    skv = k_ref.shape[0]
    d = q_ref.shape[1]
    iq = pl.program_id(2)

    q = q_ref[:].astype(jnp.float32) * sm_scale
    # Mosaic constraint: keep masks/stats 2-D (1-D bool reshapes unsupported)
    qseg_col = qseg_ref[:, :].reshape(bq, 1)  # [bq, 1] int32
    q_pos_col = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

    nk = skv // block_k
    if causal:
        # only kv blocks touching or below the diagonal
        nk_eff = jnp.minimum(nk, pl.cdiv((iq + 1) * bq, block_k))
    else:
        nk_eff = nk

    def body(j, carry):
        m, l, acc = carry  # m, l: [bq, 1] f32
        kb = k_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        kseg_row = kseg_ref[:, pl.ds(j * block_k, block_k)]  # [1, bk]
        allowed = (qseg_col == kseg_row) & (qseg_col >= 0)
        if causal:
            k_pos_row = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            allowed = allowed & (q_pos_col >= k_pos_row)
        s = jnp.where(allowed, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk_eff, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    # rows that never saw an allowed key (padding / empty causal prefix) keep
    # m at the mask floor; force their output to zero
    out = jnp.where(m > NEG_INF * 0.5, out, 0.0)
    o_ref[:] = out.astype(o_ref.dtype)


def _pad_to(x, axis, mult, value=0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,       # [B, Hq, Sq, D]
    k: jnp.ndarray,       # [B, Hkv, Skv, D]
    v: jnp.ndarray,
    q_segment_ids: jnp.ndarray,   # [B, Sq] int32, <0 = padding
    kv_segment_ids: jnp.ndarray,  # [B, Skv]
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    skv = k.shape[2]
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)

    d_p = d + (-d) % 128
    sq_p = sq + (-sq) % block_q
    skv_p = skv + (-skv) % block_k
    qp = _pad_to(_pad_to(q, 3, 128), 2, block_q)
    kp = _pad_to(_pad_to(k, 3, 128), 2, block_k)
    vp = _pad_to(_pad_to(v, 3, 128), 2, block_k)
    qsp = _pad_to(q_segment_ids.astype(jnp.int32), 1, block_q, value=-1)
    ksp = _pad_to(kv_segment_ids.astype(jnp.int32), 1, block_k, value=-2)

    grid = (b, hq, sq_p // block_q)
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, block_k=block_k, causal=causal, bq=block_q
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q), lambda bi, h, iq: (bi, iq), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p), lambda bi, h, iq: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d_p), lambda bi, h, iq: (bi, h, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, skv_p, d_p), lambda bi, h, iq: (bi, h // group, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, skv_p, d_p), lambda bi, h, iq: (bi, h // group, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, block_q, d_p), lambda bi, h, iq: (bi, h, iq, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d_p), q.dtype),
        interpret=interpret,
    )(
        qsp, ksp,
        qp, kp, vp,
    )
    return out[:, :, :sq, :d]
