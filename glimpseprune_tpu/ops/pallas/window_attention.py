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
from typing import Optional

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


def _fused_kernel(vmask_ref, qkv_ref, cos_ref, sin_ref, rot_ref, o_ref, *,
                  heads: int, scale: float, wp: int = 0):
    """One window GROUP, rope fused: qkv [rows, 3, H, D] is the qkv matmul
    output in its NATURAL layout (no host-side transposes — those cost
    ~16ms/block in HBM relayouts at 64k patches, vs 6ms for the whole
    attention kernel). rot [D, D] is the rotate_half permutation-with-sign
    matrix, so rope(x) = x*cos + (x@rot)*sin rides the MXU instead of lane
    shuffles.

    rows = wins_per_step * wp: merging several windows into ONE
    block-diagonal-masked [rows, rows] attention trades nearly-free extra
    MXU flops for W-fold fewer grid steps — the one-window-per-step version
    is fixed-overhead-bound (~16 µs/window for ~1 µs of math: 1024 grid
    steps x 16 heads x 5 tiny [64, 80] dots per ViT block). The cross-window
    score entries are masked with the same-window test qpos//wp == kpos//wp
    (wp static). wp=0 means a single window per step (mask skipped)."""
    rows = qkv_ref.shape[0]
    vrow = vmask_ref[:, :] > 0  # [1, rows]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    allowed = jnp.broadcast_to(vrow, (rows, rows)) | (qpos == kpos)
    if wp and rows > wp:
        allowed = allowed & (qpos // wp == kpos // wp)
    cos = cos_ref[:]  # [wp, D]
    sin = sin_ref[:]
    rot = rot_ref[:]  # [D, D]

    def rope(x):
        xr = jax.lax.dot_general(
            x, rot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return x * cos + xr * sin

    for h in range(heads):  # static unroll: tiny 2-D dots per head
        q = rope(qkv_ref[:, 0, h, :])
        k = rope(qkv_ref[:, 1, h, :])
        v = qkv_ref[:, 2, h, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # output block is [H, wp, D]: leading-dim stores are the Mosaic-
        # supported pattern (a [wp, h-slice, D] store fails shape inference)
        o_ref[h] = o.astype(o_ref.dtype)


def rotate_half_matrix(d: int, dtype=jnp.float32) -> jnp.ndarray:
    """R with x @ R == rotate_half(x) (ops/rope.py convention)."""
    import numpy as np

    half = d // 2
    r = np.zeros((d, d), dtype=np.float32)
    for i in range(half):
        r[i + half, i] = -1.0  # rh[:half] = -x[half:]
        r[i, i + half] = 1.0   # rh[half:] = x[:half]
    return jnp.asarray(r, dtype=dtype)


# Windows merged per grid step (chip-swept at the 64k-patch ViT shape; see
# tools/sweep_vision_attention.py). Each step runs one block-diagonal-masked
# [W*64, W*64] attention instead of W tiny [64, 64] ones. W=2 is the family
# optimum on-chip (8.16 -> 7.59 ms): the per-step fixed overhead is only
# ~1.1 us (ng terms) against a ~7.0 ms intrinsic term, and the [rows, rows]
# mask/softmax VPU work grows LINEARLY with W, so large W loses even in
# theory — and in practice W>=4 (16 unrolled heads x [256, 256] chains)
# blows up the Mosaic compile (>9 min, helper killed). GP_WINS_PER_STEP
# overrides for on-chip A/B sweeps (tools/sweep_vision_attention.py).
WINS_PER_STEP = int(__import__("os").environ.get("GP_WINS_PER_STEP", "2"))


@functools.partial(jax.jit, static_argnames=("wp", "interpret", "wins_per_step"))
def window_attention_fused(
    qkv: jnp.ndarray,     # [P, 3, H, D] qkv-projection output, pre-rope
    cos: jnp.ndarray,     # [P, D]
    sin: jnp.ndarray,     # [P, D]
    valid: jnp.ndarray,   # [P] bool
    wp: int,
    interpret: bool = False,
    wins_per_step: Optional[int] = None,
) -> jnp.ndarray:
    """Rope + window attention in one pallas pass -> [P, H, D] (natural
    layout in AND out; see _fused_kernel). wins_per_step windows share one
    grid step (block-diagonal mask); the window count pads up to a multiple
    with invalid windows (vrow=False + the self-attention diagonal keeps
    their softmax finite; pad outputs are sliced away)."""
    p, three, h, d = qkv.shape
    assert three == 3
    nw = p // wp
    W = WINS_PER_STEP if wins_per_step is None else wins_per_step
    W = max(1, min(W, nw))
    scale = 1.0 / (d ** 0.5)
    qkvw = qkv.reshape(nw, wp, 3, h, d)
    cosw = cos.reshape(nw, wp, d).astype(qkv.dtype)
    sinw = sin.reshape(nw, wp, d).astype(qkv.dtype)
    vmask = valid.reshape(nw, wp).astype(jnp.int32)
    nw_p = nw + (-nw) % W
    if nw_p != nw:
        padw = [(0, nw_p - nw)] + [(0, 0)] * (qkvw.ndim - 1)
        qkvw = jnp.pad(qkvw, padw)
        cosw = jnp.pad(cosw, padw[:3])
        sinw = jnp.pad(sinw, padw[:3])
        vmask = jnp.pad(vmask, padw[:2])
    rows = W * wp
    ng = nw_p // W
    qkvg = qkvw.reshape(ng, rows, 3, h, d)
    cosg = cosw.reshape(ng, rows, d)
    sing = sinw.reshape(ng, rows, d)
    vmaskg = vmask.reshape(ng, 1, rows)
    rot = rotate_half_matrix(d, qkv.dtype)

    kernel = functools.partial(_fused_kernel, heads=h, scale=scale,
                               wp=wp if W > 1 else 0)
    out = pl.pallas_call(
        kernel,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((None, 1, rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, 3, h, d), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, h, rows, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ng, h, rows, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(vmaskg, qkvg, cosg, sing, rot)
    out = out.reshape(ng, h, W, wp, d).transpose(0, 2, 3, 1, 4)
    return out.reshape(nw_p, wp, h, d)[:nw].reshape(p, h, d)


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
