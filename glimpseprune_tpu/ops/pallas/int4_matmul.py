"""Fused int4-dequant matmul (Pallas TPU) — the int4 decode hot path.

Decode at small batch is HBM-bandwidth-bound: the per-step cost is reading
the weights. The int4 tier halves the bytes (3.3 GB vs 6.65 at 7B) — but
only if the packed nibbles are dequantized IN VMEM, fused into the matmul.
XLA cannot fuse the unpack chain (shift/concat) into a dot operand: it
materializes the full bf16 kernel per layer per step, turning int4 decode
into 3.3 GB read + 6.65 GB write + 6.65 GB read ≈ 17x slower than int8
(185 ms/step measured vs 10.7, docs/ROUND4.md §6). This kernel reads only
the packed bytes + group scales.

Layout (quantization.quantize_int4, block-halves):
    packed int8 [K/2, N] — w row r in the low nibble, row r + K/2 in the
    high nibble; scales f32 [K/g, N], g=64 contraction rows per group.

Per grid step (n-tile j, k-tile k): the packed tile [bkp, bn] unpacks into
two nibble planes; each plane dots against its OWN x slice (rows
[k*bkp, ...) for lo, [K/2 + k*bkp, ...) for hi) — block-halves packing
means no in-kernel shuffle. Group scales are applied per-group on the dot
RESULT (one [M, bn] * [bn] row-broadcast per group), so the MXU consumes
raw int4 values cast to bf16 and the scale multiply never touches the
[bkp, bn] weight tile.

The reference's analogous tier is bitsandbytes nf4 CUDA kernels
(llava_gp/model/builder.py:27-100); this is the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# "auto": pallas on TPU for small-M (decode) shapes, XLA dequant otherwise.
# "xla" forces the dequant path; "pallas_interpret" runs the kernel in
# interpret mode (CPU equivalence tests).
INT4_MATMUL_IMPL = "auto"

# kernel applies only where the MXU shape rules hold; callers fall back to
# the XLA dequant path otherwise
_BKP = 256      # packed-row tile (512 unpacked rows per grid step)
_BN = 512       # output-column tile
_M_MAX = 128    # decode/sampling shapes route to the M-flat decode kernel;
                # larger M routes to the tiled prefill kernel below
_BM = 512       # prefill m-tile


def _kernel(xlo_ref, xhi_ref, p_ref, s_ref, o_ref, acc_ref,
            *, g: int, nk: int, bkp: int):
    # s_ref carries ALL K/g scale rows for this n-tile (whole-dim block:
    # a [bkp//g, bn] block would violate the sublane-divisible-by-8 rule
    # at bkp//g = 4); lo rows live at [k*sg + gi], hi rows at nk*sg after
    k = pl.program_id(1)
    sg = bkp // g

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic cannot legalize i8 vector shifts (arith.shli on vector<i8>) —
    # unpack in i32; arithmetic shifts sign-extend each nibble
    p32 = p_ref[...].astype(jnp.int32)        # [bkp, bn]
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    xlo = xlo_ref[...]                        # [M, bkp]
    xhi = xhi_ref[...]
    lo = lo.astype(xlo.dtype)
    hi = hi.astype(xhi.dtype)

    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[...]
    for gi in range(sg):
        sl = slice(gi * g, (gi + 1) * g)
        plo = jax.lax.dot_general(xlo[:, sl], lo[sl], dn,
                                  preferred_element_type=jnp.float32)
        phi = jax.lax.dot_general(xhi[:, sl], hi[sl], dn,
                                  preferred_element_type=jnp.float32)
        # group scale applied on the [M, bn] dot result, not the weight tile
        acc = acc + plo * s_ref[pl.ds(k * sg + gi, 1), :]
        acc = acc + phi * s_ref[pl.ds(nk * sg + k * sg + gi, 1), :]
    acc_ref[...] = acc

    @pl.when(k == nk - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def kernel_applicable(m: int, kdim: int, n: int, g: int) -> bool:
    """Static shape gate for the fused kernel (wrapper + _dense routing)."""
    return (
        m <= _M_MAX
        and g == 64
        and kdim % (2 * _BKP) == 0
        and (kdim // 2) % g == 0
        and n % _BN == 0
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def matmul_int4(x, packed, scales, out_dtype=jnp.bfloat16,
                interpret: bool = False):
    """x [..., K] @ int4-packed [K/2, N] (+ scales [K/g, N]) -> [..., N].

    Caller must have checked `kernel_applicable(M, K, N, g)` (M = product
    of x's leading dims); this function asserts it.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = packed.shape[-1]
    g = K // scales.shape[-2]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    assert kernel_applicable(M, K, N, g), (M, K, N, g)

    # pad rows to the bf16 sublane tile
    Mp = max(16, -(-M // 16) * 16)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    kp = K // 2
    nk = kp // _BKP
    nn = N // _BN
    n_scale_rows = K // g

    out = pl.pallas_call(
        functools.partial(_kernel, g=g, nk=nk, bkp=_BKP),
        grid=(nn, nk),
        in_specs=[
            # x low-half slice: rows [k*bkp, (k+1)*bkp)
            pl.BlockSpec((Mp, _BKP), lambda j, k: (0, k)),
            # x high-half slice: rows [K/2 + k*bkp, ...) — block index nk + k
            pl.BlockSpec((Mp, _BKP), lambda j, k, _nk=nk: (0, _nk + k)),
            pl.BlockSpec((_BKP, _BN), lambda j, k: (k, j)),
            # all K/g scale rows of this n-tile (whole first dim: tiny, and
            # a per-k-tile block would be 4 sublanes < the rule of 8)
            pl.BlockSpec((n_scale_rows, _BN), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, _BN), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Mp, _BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, x2, packed, scales)
    return out[:M].reshape(lead + (N,))


# ---------------------------------------------------------------------------
# Prefill kernels (large M): full-K-tile dots, scale applied on the WEIGHT
# tile in VMEM (the decode kernel's scale-on-result trick needs one dot per
# 64-row group, which halves MXU utilization — irrelevant when decode is
# HBM-bound, fatal when prefill is compute-bound).
#
#   W4A16 (a8=False): unpack nibbles -> f32, multiply by the group scale
#     rows (broadcast 64-wide), cast to the x dtype, ONE bf16 dot per
#     nibble plane per k-tile. Numerically identical to the XLA dequant
#     path, without ever materializing a bf16 kernel in HBM.
#   W4A8 (a8=True, VERDICT r4 #3): REQUANTIZE the tile to per-column int8
#     in VMEM — q8 = round(q4 * s_group/s8_col), s8_col = max_g(s) * 7/127 —
#     then int8 x int8 -> int32 MXU dots (the v5e native int8 mode, 2x bf16
#     peak) with an int32 accumulator across k-tiles; the emit applies
#     per-row activation scale x per-column s8. Requantization error is
#     <= s8/2 = (127/7 * max_g s)/254 per weight — below the inherent int4
#     group-quant step s_g/2 except for groups >18x quieter than the
#     column's loudest, where the absolute error is tiny anyway (cosine
#     >0.9999 vs the dequant path in tests).
#
# Reference analogue: bitsandbytes nf4 prefill dequant-on-the-fly
# (llava_gp/model/builder.py:27-100); this is the TPU-native version with
# the activation-quantized serving tier fused in.
# ---------------------------------------------------------------------------


def _row_scales(s_ref, row0, sg: int, g: int, bn: int):
    """[sg*g, bn] scale expansion for one k-tile: sg single-row dynamic
    slices of the whole-dim scale block (the decode kernel's Mosaic-proven
    access pattern — a multi-row pl.ds at offset k*sg fails the
    sublane-multiple-of-8 proof), each broadcast g rows, statically
    concatenated."""
    parts = [
        jnp.broadcast_to(s_ref[pl.ds(row0 + gi, 1), :], (g, bn))
        for gi in range(sg)
    ]
    return parts[0] if sg == 1 else jnp.concatenate(parts, axis=0)


def _kernel_prefill_a16(xlo_ref, xhi_ref, p_ref, s_ref, o_ref, acc_ref,
                        *, g: int, nk: int, bkp: int):
    k = pl.program_id(2)
    sg = bkp // g

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = p_ref[...].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.float32)
    hi = jnp.right_shift(p32, 4).astype(jnp.float32)
    bn = p_ref.shape[1]
    wlo = (lo * _row_scales(s_ref, k * sg, sg, g, bn)).astype(xlo_ref.dtype)
    whi = (hi * _row_scales(s_ref, (nk + k) * sg, sg, g, bn)
           ).astype(xhi_ref.dtype)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(xlo_ref[...], wlo, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(xhi_ref[...], whi, dn,
                              preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_prefill_a8(xlo_ref, xhi_ref, p_ref, r_ref, s8_ref, xs_ref,
                       o_ref, acc_ref, *, g: int, nk: int, bkp: int):
    k = pl.program_id(2)
    sg = bkp // g

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = p_ref[...].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.float32)
    hi = jnp.right_shift(p32, 4).astype(jnp.float32)
    bn = p_ref.shape[1]
    # requantize to per-column int8 in VMEM (r = s_group / s8_col, so
    # |q4 * r| <= 7 * s_max/s8 = 127 by construction)
    q8lo = jnp.round(
        lo * _row_scales(r_ref, k * sg, sg, g, bn)).astype(jnp.int8)
    q8hi = jnp.round(
        hi * _row_scales(r_ref, (nk + k) * sg, sg, g, bn)).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(xlo_ref[...], q8lo, dn,
                            preferred_element_type=jnp.int32)
        + jax.lax.dot_general(xhi_ref[...], q8hi, dn,
                              preferred_element_type=jnp.int32))

    @pl.when(k == nk - 1)
    def _emit():
        o_ref[...] = (acc_ref[...].astype(jnp.float32)
                      * xs_ref[:, 0:1] * s8_ref[0:1, :]).astype(o_ref.dtype)


def _prefill_tiles(kdim: int, n: int, g: int):
    """(bkp, bn) for the prefill kernel, or None where no tiling fits.
    Adaptive so the ViT shapes (K=1280, N=3840/3456) compile too (benches);
    routing only sends bkp=256 shapes here — see prefill_routable."""
    bkp = next((b for b in (_BKP, 128, 64) if (kdim // 2) % b == 0 and
                b % g == 0), None)
    bn = next((b for b in (_BN, 256, 128) if n % b == 0), None)
    return (bkp, bn) if bkp and bn else None


def prefill_applicable(m: int, kdim: int, n: int, g: int) -> bool:
    """Static gate for the prefill kernels (M above the decode kernel's
    range; shapes tileable)."""
    return (m > _M_MAX and g >= 64 and kdim % (2 * g) == 0
            and _prefill_tiles(kdim, n, g) is not None)


def prefill_routable(m: int, kdim: int, n: int, g: int, a8: bool) -> bool:
    """Should _dense route this matmul to the Pallas prefill kernel?

    Chip-measured (docs/ROUND5.md §int4): W4A8 beats the XLA dequant path
    on the 7B decoder shapes (162/224/203 vs 141/175/180 TF/s at M=16384)
    but W4A16 loses everywhere (XLA amortizes the dequant at large M), and
    the ViT's K=1280 shapes lose in-kernel at every tier (bkp=128 k-tiles:
    86 vs 147 TF/s) — so only a8 with full 256-wide packed k-tiles routes
    here; everything else keeps the XLA dequant path."""
    if not (a8 and prefill_applicable(m, kdim, n, g)):
        return False
    return _prefill_tiles(kdim, n, g)[0] == _BKP


@functools.partial(jax.jit, static_argnames=("out_dtype", "a8", "interpret"))
def matmul_int4_prefill(x, packed, scales, out_dtype=jnp.bfloat16,
                        a8: bool = False, interpret: bool = False):
    """x [..., K] @ int4-packed [K/2, N] for prefill M (tiled over rows).

    a8=False: weight-only (W4A16) — dequant in VMEM, bf16 dots.
    a8=True: W4A8 — per-row dynamic int8 activations against in-VMEM
    requantized int8 weights on the native int8 MXU mode.
    Caller must have checked `prefill_applicable`.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = packed.shape[-1]
    g = K // scales.shape[-2]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    assert prefill_applicable(M, K, N, g), (M, K, N, g)
    bkp, bn = _prefill_tiles(K, N, g)

    bm = _BM if M >= _BM else -(-M // 32) * 32  # int8 sublane tile = 32
    Mp = -(-M // bm) * bm
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    kp = K // 2
    nm, nk, nn = Mp // bm, kp // bkp, N // bn
    n_scale_rows = K // g

    common = dict(
        grid=(nm, nn, nk),
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
    x_specs = [
        pl.BlockSpec((bm, bkp), lambda i, j, k: (i, k)),
        pl.BlockSpec((bm, bkp), lambda i, j, k, _nk=nk: (i, _nk + k)),
    ]
    w_spec = pl.BlockSpec((bkp, bn), lambda i, j, k: (k, j))
    s_spec = pl.BlockSpec((n_scale_rows, bn), lambda i, j, k: (0, j))

    if not a8:
        out = pl.pallas_call(
            functools.partial(_kernel_prefill_a16, g=g, nk=nk, bkp=bkp),
            in_specs=x_specs + [w_spec, s_spec],
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            **common,
        )(x2, x2, packed, scales)
        return out[:M].reshape(lead + (N,))

    # dynamic per-row activation int8 (same recipe as quantization.matmul_w8a8)
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    # per-column int8 weight scale + requant ratios (tiny, O(K/g * N))
    s8 = jnp.maximum(jnp.max(scales, axis=-2, keepdims=True), 1e-12) * (7.0 / 127.0)
    r = scales / s8
    xs_in = jnp.broadcast_to(xs, (Mp, 128))
    s8_in = jnp.broadcast_to(s8, (8, N))
    out = pl.pallas_call(
        functools.partial(_kernel_prefill_a8, g=g, nk=nk, bkp=bkp),
        in_specs=x_specs + [
            w_spec, s_spec,
            pl.BlockSpec((8, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((bm, 128), lambda i, j, k: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        **common,
    )(xq, xq, packed, r, s8_in, xs_in)
    return out[:M].reshape(lead + (N,))
