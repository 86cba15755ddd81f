"""Fused int4-dequant Pallas matmul (ops/pallas/int4_matmul.py).

Interpret-mode equivalence with the XLA dequant path + routing gates.
The kernel is the int4 DECODE tier: XLA's unpack chain materializes the
bf16 kernel per step (185 ms/step measured at 7B vs 10.7 int8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.ops.pallas.int4_matmul import (
    kernel_applicable,
    matmul_int4,
)
from glimpseprune_tpu.quantization import (
    dequant_int4,
    matmul_int4_auto,
    quantize_int4,
)


def _quant(w):
    tree = quantize_int4({"text": {"layers": {"l0": {"kernel": w}}}})
    leaf = tree["text"]["layers"]["l0"]
    assert "kernel_q4" in leaf, "alignment fell back to int8"
    return leaf


def _make(k, n, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32) * 0.05
    return _quant(w)


@pytest.mark.parametrize("m", [1, 5, 16, 33])
def test_kernel_matches_dequant(m):
    K, N = 1024, 1024
    p = _make(K, N)
    rng = np.random.default_rng(m)
    x = jnp.asarray(rng.standard_normal((m, K)), jnp.float32)

    want = x @ dequant_int4(p, jnp.float32)
    got = matmul_int4(x, p["kernel_q4"], p["kernel_scale4"],
                      out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_batched_x():
    K, N = 512, 512
    p = _make(K, N, seed=3)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 3, K)), jnp.float32)
    want = x @ dequant_int4(p, jnp.float32)
    got = matmul_int4(x, p["kernel_q4"], p["kernel_scale4"],
                      out_dtype=jnp.float32, interpret=True)
    assert got.shape == want.shape == (2, 3, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_applicability_gates():
    assert kernel_applicable(1, 3584, 152064, 64)       # lm_head
    assert kernel_applicable(28, 3584, 3584, 64)        # q_proj at B=28
    assert kernel_applicable(16, 18944, 3584, 64)       # down_proj
    assert not kernel_applicable(4096, 3584, 3584, 64)  # prefill M
    assert not kernel_applicable(1, 3584, 1000, 64)     # ragged N
    assert not kernel_applicable(1, 1176, 512, 64)      # odd K (patch embed)
    assert not kernel_applicable(1, 512, 512, 32)       # non-64 group


def test_auto_routing_matches_xla():
    """matmul_int4_auto in pallas_interpret mode == forced xla path, and
    unaligned shapes fall back without error."""
    import glimpseprune_tpu.ops.pallas.int4_matmul as m4

    K, N = 512, 512
    p = _make(K, N, seed=5)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)

    old = m4.INT4_MATMUL_IMPL
    try:
        m4.INT4_MATMUL_IMPL = "xla"
        want = matmul_int4_auto(x, p, jnp.float32)
        m4.INT4_MATMUL_IMPL = "pallas_interpret"
        got = matmul_int4_auto(x, p, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # unaligned N: silently uses dequant, still correct
        rngw = np.random.default_rng(6)
        w2 = jnp.asarray(rngw.standard_normal((K, 384)), jnp.float32) * 0.05
        p2 = _quant(w2)
        got2 = matmul_int4_auto(x, p2, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(x @ dequant_int4(p2, jnp.float32)),
            rtol=1e-5, atol=1e-5)
    finally:
        m4.INT4_MATMUL_IMPL = old


# --------------------------- prefill kernels -------------------------------

from glimpseprune_tpu.ops.pallas.int4_matmul import (  # noqa: E402
    matmul_int4_prefill,
    prefill_applicable,
)


def test_prefill_applicability_gates():
    assert prefill_applicable(4096, 3584, 18944, 64)    # 7B gate/up
    assert prefill_applicable(4096, 18944, 3584, 64)    # 7B down
    assert prefill_applicable(16384, 3584, 152064, 64)  # lm_head full-seq
    assert prefill_applicable(65536, 1280, 3840, 64)    # ViT qkv (bkp=128)
    assert prefill_applicable(65536, 1280, 3456, 64)    # ViT mlp (bn=128)
    assert not prefill_applicable(128, 3584, 3584, 64)  # decode M -> other kernel
    assert not prefill_applicable(4096, 1176, 512, 64)  # odd K (patch embed)
    assert not prefill_applicable(4096, 512, 500, 64)   # ragged N


def test_prefill_a16_matches_dequant():
    """W4A16 prefill kernel == the XLA dequant path (same math, in VMEM)."""
    K, N = 1024, 1024
    p = _make(K, N, seed=9)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((200, K)), jnp.float32)
    want = x @ dequant_int4(p, jnp.float32)
    got = matmul_int4_prefill(x, p["kernel_q4"], p["kernel_scale4"],
                              out_dtype=jnp.float32, a8=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def _w4a8_emulation(x, p):
    """The kernel's exact math in plain jnp: per-row int8 activations x
    in-VMEM per-column-requantized int8 weights, int32 accumulate."""
    packed, scales = p["kernel_q4"], p["kernel_scale4"]
    q = np.asarray(dequant_int4({"kernel_q4": packed,
                                 "kernel_scale4": jnp.ones_like(scales)},
                                jnp.float32))  # raw int4 values as f32
    s = np.asarray(scales, np.float32)
    K = q.shape[0]
    g = K // s.shape[0]
    s8 = np.maximum(s.max(axis=0, keepdims=True), 1e-12) * (7.0 / 127.0)
    r = s / s8
    q8 = np.rint(q * np.repeat(r, g, axis=0)).astype(np.int32)
    xf = np.asarray(x, np.float32)
    amax = np.abs(xf).max(axis=-1, keepdims=True)
    xs = np.maximum(amax, 1e-8) / 127.0
    xq = np.clip(np.rint(xf / xs), -127, 127).astype(np.int32)
    return (xq @ q8).astype(np.float32) * xs * s8


def test_prefill_a8_matches_emulation():
    """W4A8 kernel == its requant emulation exactly, and stays close to the
    full-precision dequant path (requant error below the int4 step)."""
    K, N = 1024, 1024
    p = _make(K, N, seed=21)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((160, K)), jnp.float32)
    got = np.asarray(matmul_int4_prefill(
        x, p["kernel_q4"], p["kernel_scale4"], out_dtype=jnp.float32,
        a8=True, interpret=True))
    want = _w4a8_emulation(x, p)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    ref = np.asarray(x @ dequant_int4(p, jnp.float32))
    cos = float(np.sum(got * ref)
                / (np.linalg.norm(got) * np.linalg.norm(ref)))
    assert cos > 0.999, cos


def test_auto_routing_prefill():
    """Large-M a8 routes to the W4A8 prefill kernel; a16 prefill stays on
    the XLA dequant path (chip-measured faster there, ROUND5.md)."""
    import glimpseprune_tpu.ops.pallas.int4_matmul as m4

    K, N = 512, 512
    p = _make(K, N, seed=4)
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal((192, K)), jnp.float32)
    old = m4.INT4_MATMUL_IMPL
    try:
        m4.INT4_MATMUL_IMPL = "xla"
        want = matmul_int4_auto(x, p, jnp.float32)
        m4.INT4_MATMUL_IMPL = "pallas_interpret"
        got16 = matmul_int4_auto(x, p, jnp.float32)
        np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        got8 = np.asarray(matmul_int4_auto(x, p, jnp.float32, a8=True))
        np.testing.assert_allclose(got8, _w4a8_emulation(x, p),
                                   rtol=2e-4, atol=2e-4)
    finally:
        m4.INT4_MATMUL_IMPL = old


def test_prefill_routable_policy():
    """The measured routing policy: a8-only, 256-wide packed k-tiles only."""
    from glimpseprune_tpu.ops.pallas.int4_matmul import prefill_routable

    assert prefill_routable(16384, 3584, 18944, 64, True)    # 7B mlp
    assert prefill_routable(512, 3584, 152064, 64, True)     # chunked head
    assert prefill_routable(16384, 5120, 3584, 64, True)     # ViT merger
    assert not prefill_routable(16384, 3584, 18944, 64, False)  # a16 -> XLA
    assert not prefill_routable(65536, 1280, 3840, 64, True)    # ViT qkv
    assert not prefill_routable(128, 3584, 18944, 64, True)     # decode M
