"""Weight-only int8 quantization for the frozen base model.

TPU-native replacement for the reference's bitsandbytes 8/4-bit builder
(reference llava/model/builder.py load_8bit/load_4bit): the goal there is
fitting the frozen LVLM in accelerator memory; here the payoff is the same —
Qwen2.5-VL-7B at bf16 is 16.6 GB and does not fit a 16 GB v5e chip, while
int8 decoder weights bring it to ~10 GB.

Scheme: symmetric per-output-channel int8 on the big matmul kernels
(`.../kernel` leaves, 2-D or stacked 3-D [L, in, out]). A quantized kernel
becomes two leaves next to each other in the same param dict:

    {"kernel_q": int8 [..., in, out], "kernel_scale": f32 [..., 1, out]}

`_dense` in the language/vision towers dequantizes at use:
`w = kernel_q * kernel_scale` in bf16 — XLA fuses the multiply into the
matmul's operand pipeline, and inside the layer scan only ONE layer's
weights ever materialize in bf16 (the HBM-resident stack stays int8).
GP modules, norms, biases, and embeddings stay in bf16/f32 (they are
<15% of weights and carry most of the quantization sensitivity).

Sharding: `kernel_q` inherits the kernel's PartitionSpec via the
`kernel(_q)?` rules in parallel/mesh.py; `kernel_scale` is replicated
(tiny) and broadcasts across output shards under GSPMD.

QLoRA: `insert_lora` (training/lora.py) also targets `kernel_q` paths, so
adapters train *over the int8 base* — the in-scan per-layer adapter matmul
composes with the dequant-at-use path (tests/test_quantization.py::
test_qlora_int8_base_plus_inscan_lora; 7B int8 GRPO fits one 16 GB chip).
Only the merged-weight `apply_lora` path remains fp-only (merging into an
int8 kernel would need requantization).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# kernels worth quantizing: the stacked decoder / vision-block matmuls.
DEFAULT_INCLUDE: Sequence[str] = (
    r"text/layers/.*/kernel",
    r"text/lm_head/kernel",
    r"visual/blocks/.*/kernel",
)


def _match(path: str, patterns: Sequence[str]) -> bool:
    return any(re.fullmatch(p, path) for p in patterns)


def matmul_w8a8(x, kernel_q, kernel_scale, dtype):
    """Dynamic W8A8 matmul: per-row symmetric int8 activation quantization +
    the v5e MXU's native int8 mode (int8 x int8 -> int32 accumulate), then a
    rank-1 rescale by (row amax/127) x per-channel weight scale.

    Measured on one v5e at the 16k-token ViT MLP shape ([65536, 1280] x
    [1280, 3456]): bf16 189 TF/s -> 271 TF/s END TO END including the
    activation quant pass (int8 MXU peak is 394 TOPS) — a 1.43x matmul
    speedup. This is the activation-quantized serving tier (`act_quant`
    config knob); the reference serves bf16 activations over bitsandbytes
    int8 weights (llava/model/builder.py load_8bit), which is the a8-off
    tier here.

    x: [..., K] activations (any leading dims); kernel_q int8 [K, N];
    kernel_scale f32 [1, N] (per-output-channel, from quantize_int8).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * kernel_scale.astype(jnp.float32)
    return y.astype(dtype)


def quantize_int8(
    params: Dict[str, Any],
    include: Sequence[str] = DEFAULT_INCLUDE,
) -> Dict[str, Any]:
    """Return a new param tree with matching kernels replaced by
    (kernel_q int8, kernel_scale f32) pairs. Idempotent on already-quantized
    trees (quantized kernels no longer match `.../kernel`)."""

    def walk(node, prefix):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            path = f"{prefix}/{name}" if prefix else name
            if (
                name == "kernel"
                and _match(path, include)
                and getattr(child, "ndim", 0) >= 2
            ):
                w = np.asarray(child, dtype=np.float32)
                # per-(layer, output-channel) symmetric: reduce only the
                # contraction dim, keep leading stack axes
                amax = np.abs(w).max(axis=-2, keepdims=True)
                scale = np.maximum(amax, 1e-8) / 127.0
                q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
                out["kernel_q"] = jnp.asarray(q)
                out["kernel_scale"] = jnp.asarray(scale.astype(np.float32))
            else:
                out[name] = walk(child, path)
        return out

    return walk(params, "")


INT4_GROUP = 64  # contraction-dim group size per scale (bitsandbytes uses 64)


def _int4_group(fin: int, group: int = INT4_GROUP) -> int:
    """Largest group <= INT4_GROUP for which fin splits into 2*g-aligned
    packing (small test configs shrink the group instead of losing the
    tier); 0 = fall back to int8."""
    g = group
    while g >= 8 and fin % (2 * g) != 0:
        g //= 2
    return g if g >= 8 else 0


def quantize_int4(
    params: Dict[str, Any],
    include: Sequence[str] = DEFAULT_INCLUDE,
    group: int = INT4_GROUP,
) -> Dict[str, Any]:
    """4-bit weight-only tier (reference llava builder load_4bit,
    llava_gp/model/builder.py:27-100). Symmetric int4 per
    (contraction-group, output-channel), two nibbles packed per int8 byte —
    jnp.int4 device arrays recurse in this machine's TPU plugin, so packing
    is explicit and portable:

        {"kernel_q4": int8 [..., in/2, out],       # row r in the low nibble,
                                                   # row r + in/2 in the high
                                                   # nibble (block-halves)
         "kernel_scale4": f32 [..., in/group, out]}

    Block-halves (not row-interleaved) packing: the unpack is a concat of
    the two nibble planes along the contraction dim — XLA fuses it better
    than an interleaving stack+reshape, and the fused Pallas decode kernel
    (ops/pallas/int4_matmul.py) reads each plane against its own x slice
    with no in-kernel shuffle at all.
    """

    def walk(node, prefix):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            path = f"{prefix}/{name}" if prefix else name
            if (
                name == "kernel"
                and _match(path, include)
                and getattr(child, "ndim", 0) >= 2
            ):
                w = np.asarray(child, dtype=np.float32)
                lead, fin, fout = w.shape[:-2], w.shape[-2], w.shape[-1]
                g = _int4_group(fin, group)
                if g == 0:
                    # odd contraction dims (e.g. the 1176-wide patch embed)
                    # take the int8 tier — matches quantize_structure
                    amax = np.abs(w).max(axis=-2, keepdims=True)
                    scale = np.maximum(amax, 1e-8) / 127.0
                    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
                    out["kernel_q"] = jnp.asarray(q)
                    out["kernel_scale"] = jnp.asarray(scale.astype(np.float32))
                    continue
                wg = w.reshape(lead + (fin // g, g, fout))
                scale = np.maximum(np.abs(wg).max(axis=-2), 1e-8) / 7.0
                q = np.clip(
                    np.rint(wg / scale[..., None, :]), -7, 7
                ).astype(np.int8).reshape(lead + (fin, fout))
                lo = q[..., : fin // 2, :]
                hi = q[..., fin // 2 :, :]
                packed = ((lo & 0x0F) | (hi << 4)).astype(np.int8)
                out["kernel_q4"] = jnp.asarray(packed)
                out["kernel_scale4"] = jnp.asarray(scale.astype(np.float32))
            else:
                out[name] = walk(child, path)
        return out

    return walk(params, "")


def dequant_int4(p: Dict[str, Any], dtype):
    """kernel_q4/kernel_scale4 -> bf16 kernel (used inside _dense at matmul
    time; one layer's weights materialize per scan step, like int8). The
    group size is inferred from the scale shape."""
    packed = p["kernel_q4"]
    scale = p["kernel_scale4"]
    lead, fin2, fout = packed.shape[:-2], packed.shape[-2], packed.shape[-1]
    group = (fin2 * 2) // scale.shape[-2]
    # arithmetic shifts sign-extend each nibble; block-halves layout makes
    # the unpack a concat along the contraction dim (no interleave)
    lo = jnp.left_shift(packed, 4)
    lo = jnp.right_shift(lo, 4)
    hi = jnp.right_shift(packed, 4)
    q = jnp.concatenate([lo, hi], axis=-2)  # [..., in, out]
    qg = q.reshape(lead + (fin2 * 2 // group, group, fout)).astype(dtype)
    w = qg * scale[..., None, :].astype(dtype)
    return w.reshape(lead + (fin2 * 2, fout))


def matmul_int4_auto(x, p: Dict[str, Any], dtype, a8: bool = False):
    """x [..., K] @ int4 weights -> [..., N], picking the implementation:

    - small M (decode/sampling) on TPU: the fused Pallas kernel — XLA
      cannot fuse the nibble unpack into a dot operand and materializes the
      full bf16 kernel per layer per decode step (185 ms/step measured at
      7B vs 10.7 int8; docs/ROUND4.md §6);
    - large M (prefill) on TPU with a8=True and decoder-sized k-tiles: the
      W4A8 prefill kernel — in-VMEM requant to per-column int8 + native
      int8 MXU dots (VERDICT r4 #3; chip-measured 162/224/203 TF/s vs the
      dequant path's 141/175/180 at the 7B shapes);
    - everything else (CPU, W4A16 prefill, ViT shapes, unaligned shapes):
      dequant + matmul — XLA amortizes the dequant fine at large M (the
      Pallas W4A16 variant measured SLOWER than this path, ROUND5.md).

    x must already be cast to the compute dtype.
    """
    from glimpseprune_tpu.ops.pallas.int4_matmul import (
        INT4_MATMUL_IMPL,
        kernel_applicable,
        matmul_int4,
        matmul_int4_prefill,
        prefill_routable,
    )

    packed, scale = p["kernel_q4"], p["kernel_scale4"]
    if packed.ndim == 2 and INT4_MATMUL_IMPL != "xla":
        K, N = packed.shape[0] * 2, packed.shape[1]
        g = K // scale.shape[0]
        m = 1
        for d in x.shape[:-1]:
            m *= int(d)
        on_tpu = jax.default_backend() == "tpu"
        impl = INT4_MATMUL_IMPL
        use_pallas = (impl == "pallas_interpret"
                      or (impl in ("auto", "pallas") and on_tpu))
        if kernel_applicable(m, K, N, g) and use_pallas:
            return matmul_int4(x, packed, scale, out_dtype=dtype,
                               interpret=impl == "pallas_interpret")
        if prefill_routable(m, K, N, g, a8) and use_pallas:
            return matmul_int4_prefill(
                x, packed, scale, out_dtype=dtype, a8=True,
                interpret=impl == "pallas_interpret")
    return x @ dequant_int4(p, dtype)


def dequantize_int8(params: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Inverse transform (materializes bf16 kernels; for debugging/export)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if name == "kernel_q":
                out["kernel"] = (
                    child.astype(jnp.float32) * node["kernel_scale"]
                ).astype(dtype)
            elif name == "kernel_scale":
                continue
            else:
                out[name] = walk(child)
        return out

    return walk(params)


def quantized_bytes(params) -> int:
    """Total parameter bytes (reporting helper)."""
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "dtype")
    )


def quantize_structure(tree, mode: str = "int8", group: int = INT4_GROUP):
    """Shape-only transform matching quantize_int8/int4's output structure.

    Used by the stacked-layer initializers when cfg.weight_quant is set:
    flax validates a stored param's pytree against the initializer under
    eval_shape, so the module must DECLARE the quantized structure to accept
    quantized weights. Values here are placeholders (zeros/ones)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if name == "kernel" and getattr(child, "ndim", 0) >= 2:
                fin, fout = child.shape[-2], child.shape[-1]
                g = _int4_group(fin, group) if mode == "int4" else 0
                if g:
                    out["kernel_q4"] = jnp.zeros(
                        child.shape[:-2] + (fin // 2, fout), jnp.int8
                    )
                    out["kernel_scale4"] = jnp.ones(
                        child.shape[:-2] + (fin // g, fout), jnp.float32
                    )
                else:
                    out["kernel_q"] = jnp.zeros(child.shape, jnp.int8)
                    out["kernel_scale"] = jnp.ones(
                        child.shape[:-2] + (1, fout), jnp.float32
                    )
            else:
                out[name] = walk(child)
        return out

    return walk(tree)


def quantized_config(cfg, mode: str = "int8", act_quant: str = "none",
                     attn_qk_int8=False, attn_pv_int8=False):
    """ModelConfig -> same config with int8/int4 weight declarations in both
    towers (pair with quantize_int8/int4(params) when building a runner).
    act_quant="int8" additionally turns on the dynamic W8A8 matmul tier
    everywhere (matmul_w8a8; int8 weights only); "prefill" applies it to the
    compute-bound paths only (vision + prefill layers), leaving the
    HBM-bound decode scan on the weight-only dequant path — the serving
    default. attn_qk_int8 extends the tier into the flash-attention QK^T
    (per-row dynamic q/k int8; inference-only); attn_pv_int8 additionally
    moves the PV dot to the int8 MXU mode (static-1/127 p, per-column v).

    The attn tiers take a bool (both towers) or a SCOPE string "vision" /
    "text" / "both": the r3 chip ladder showed int8 attention is a net e2e
    LOSS on the LLM's native-D=128 path (+33 ms pruned prefill — the quant
    pass buys nothing where bf16 already fills the MXU), and the r4 ladder's
    decisive 64k-patch timing showed the ViT-side win is real but small
    (qk8 94.5 vs bf16 91.0 TF/s — the 2x r3 numbers at S=8192 were
    tunnel-noise-dominated). The tiers therefore ship OFF by default;
    "vision" is the only scope with a measured kernel-level win (see
    docs/ROUND4.md for the e2e verdict)."""
    import dataclasses

    def _scoped(flag, tower: str, name: str) -> bool:
        if isinstance(flag, str):
            if flag not in ("vision", "text", "both"):
                raise ValueError(
                    f"{name} must be bool or 'vision'/'text'/'both', got {flag!r}")
            return flag in (tower, "both")
        return bool(flag)

    if act_quant in ("int8", "prefill"):
        # int8 weights ride matmul_w8a8; int4 weights ride the W4A8
        # prefill kernel (ops/pallas/int4_matmul.matmul_int4_prefill)
        assert mode in ("int8", "int4"), "act_quant requires quantized weights"
    elif act_quant != "none":
        raise ValueError(f"act_quant must be none/int8/prefill, got {act_quant!r}")
    towers = {}
    for tower in ("vision", "text"):
        qk8 = _scoped(attn_qk_int8, tower, "attn_qk_int8")
        pv8 = _scoped(attn_pv_int8, tower, "attn_pv_int8")
        if qk8:
            assert act_quant != "none", "attn_qk_int8 rides the act_quant tier"
        if pv8:
            assert qk8, \
                f"attn_pv_int8 rides the attn_qk_int8 tier (tower {tower!r})"
        towers[tower] = (qk8, pv8)
    return dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, weight_quant=mode,
                                 act_quant=act_quant,
                                 attn_qk_int8=towers["text"][0],
                                 attn_pv_int8=towers["text"][1]),
        vision=dataclasses.replace(cfg.vision, weight_quant=mode,
                                   act_quant=act_quant,
                                   attn_qk_int8=towers["vision"][0],
                                   attn_pv_int8=towers["vision"][1]),
    )
