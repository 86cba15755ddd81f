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
_M_MAX = 128    # decode/sampling shapes up to the big-batch serving frontier
                # (int4 frees ~3.3 GB HBM -> B>64 decode rows are feasible);
                # prefill (M in the thousands) is compute-bound and the
                # amortized XLA dequant is fine there


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
