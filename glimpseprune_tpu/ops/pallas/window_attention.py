"""Pallas TPU fused window attention for the ViT's windowed blocks.

Each 112px window is exactly `wp` (=64) patches in the window-padded layout
(preprocessing/geometry.py), so windowed attention is thousands of tiny
[wp, D] attentions. The XLA einsum path round-trips logits/probs through HBM
and is latency-bound (~15 ms across the 32-block ViT at bench shapes for
~2 GFLOP of math). This kernel keeps one window's q/k/v for all heads in
VMEM and fuses QK^T -> mask -> softmax -> PV in a single program, so HBM
traffic is exactly one read of q/k/v + one write of the output.

Layout: [n_win, heads, wp, D] (block = one window, all heads; the per-head
2-D dots are unrolled in the kernel — `heads` is a static config constant).
D=80 is allowed as a full-dimension block (Mosaic: block == array dim).
The reference runs these windows through flash-attn varlen with cu_seqlens
(model_gp.py:1779-1801); dense per-window tiles are the TPU shape for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(vmask_ref, q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    # vmask [1, wp] int32; q/k/v/o [heads, wp, d]
    wp = q_ref.shape[1]
    vrow = vmask_ref[:, :] > 0  # [1, wp]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (wp, wp), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (wp, wp), 1)
    allowed = jnp.broadcast_to(vrow, (wp, wp)) | (qpos == kpos)
    for h in range(heads):  # static unroll: tiny 2-D dots per head
        q = q_ref[h].astype(jnp.float32) * scale
        k = k_ref[h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v_ref[h].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("wp", "interpret"))
def window_attention(
    q: jnp.ndarray,       # [P, H, D], P = n_win * wp
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,   # [P] bool
    wp: int,
    interpret: bool = False,
) -> jnp.ndarray:
    p, h, d = q.shape
    nw = p // wp
    scale = 1.0 / (d ** 0.5)
    qw = q.reshape(nw, wp, h, d).transpose(0, 2, 1, 3)  # [nw, H, wp, D]
    kw = k.reshape(nw, wp, h, d).transpose(0, 2, 1, 3)
    vw = v.reshape(nw, wp, h, d).transpose(0, 2, 1, 3)
    vmask = valid.reshape(nw, 1, wp).astype(jnp.int32)

    kernel = functools.partial(_kernel, heads=h, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((None, 1, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, wp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, wp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, wp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, h, wp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nw, h, wp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(vmask, qw, kw, vw)
    return out.transpose(0, 2, 1, 3).reshape(p, h, d)
