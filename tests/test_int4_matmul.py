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
