"""Pallas flash attention vs the einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention


def reference_attention(q, k, v, q_seg, kv_seg, causal, sm_scale=None):
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / np.sqrt(d)
    k = jnp.repeat(k, hq // hkv, axis=1)
    v = jnp.repeat(v, hq // hkv, axis=1)
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k).astype(jnp.float32) * sm_scale
    allowed = (q_seg[:, :, None] == kv_seg[:, None, :]) & (q_seg >= 0)[:, :, None]
    if causal:
        allowed = allowed & (jnp.arange(sq)[:, None] >= jnp.arange(k.shape[2])[None, :])
    logits = jnp.where(allowed[:, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows -> zero output (flash kernel semantics)
    any_allowed = allowed.any(-1)[:, None, :, None]
    out = jnp.einsum("bhst,bhtd->bhsd", probs, v.astype(jnp.float32))
    return jnp.where(any_allowed, out, 0.0)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "b,hq,hkv,sq,skv,d",
    [
        (1, 2, 2, 128, 128, 64),
        (2, 4, 2, 256, 256, 128),
        (1, 2, 1, 130, 130, 80),   # unaligned seq + head dim -> padding path
    ],
)
def test_flash_matches_reference(causal, b, hq, hkv, sq, skv, d):
    rng = np.random.default_rng(0)
    q = jnp.array(rng.normal(size=(b, hq, sq, d)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, hkv, skv, d)).astype(np.float32))
    v = jnp.array(rng.normal(size=(b, hkv, skv, d)).astype(np.float32))
    # two segments + trailing padding
    q_seg = np.zeros((b, sq), dtype=np.int32)
    q_seg[:, sq // 2 :] = 1
    q_seg[:, -7:] = -1
    kv_seg = np.zeros((b, skv), dtype=np.int32)
    kv_seg[:, skv // 2 :] = 1
    kv_seg[:, -7:] = -1

    out = flash_attention(
        q, k, v, jnp.array(q_seg), jnp.array(kv_seg), causal=causal, interpret=True
    )
    ref = reference_attention(q, k, v, jnp.array(q_seg), jnp.array(kv_seg), causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_padding_rows_zero():
    q = jnp.ones((1, 1, 128, 64))
    k = jnp.ones((1, 1, 128, 64))
    v = jnp.ones((1, 1, 128, 64))
    seg = jnp.full((1, 128), -1, dtype=jnp.int32)  # everything padding
    out = flash_attention(q, k, v, seg, seg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_pipeline_flash_vs_xla_equivalence():
    """Full glimpse pipeline with the flash kernel (interpret) vs einsum:
    validates the in-context dispatch (masks, GQA, padding semantics)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_training import build_batch, init_params

    from glimpseprune_tpu.config import tiny_test_config
    from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner
    import glimpseprune_tpu.ops.attention as A

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    runner = GlimpsePruneRunner(cfg, params)
    out_xla = runner.glimpse(prep)
    try:
        A.set_attention_impl("flash_interpret")
        runner2 = GlimpsePruneRunner(cfg, params)
        out_flash = runner2.glimpse(prep)
    finally:
        A.set_attention_impl("auto")

    np.testing.assert_allclose(
        np.asarray(out_flash.mask_logits), np.asarray(out_xla.mask_logits),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out_flash.keep_img), np.asarray(out_xla.keep_img)
    )
    np.testing.assert_allclose(
        np.asarray(out_flash.logits), np.asarray(out_xla.logits), rtol=5e-3, atol=5e-3
    )


def test_window_attention_kernel_matches_xla():
    """Fused window kernel (interpret) == XLA einsum path."""
    import numpy as np
    import jax.numpy as jnp
    from glimpseprune_tpu.ops import attention as A

    rng = np.random.default_rng(3)
    wp, nw, h, d = 64, 3, 4, 80
    P = nw * wp
    q = jnp.asarray(rng.normal(size=(P, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(P, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(P, h, d)), jnp.float32)
    valid = jnp.asarray(rng.random(P) > 0.2)
    A.set_attention_impl("xla")
    try:
        ref = A.batched_window_attention(q, k, v, valid, wp)
    finally:
        A.set_attention_impl("auto")
    A.set_attention_impl("flash_interpret")
    try:
        got = A.batched_window_attention(q, k, v, valid, wp)
    finally:
        A.set_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_attention_gradients_match_reference():
    """Custom VJP: pallas forward, XLA-reference backward — exact grads.
    Training at S >= 512 differentiates through the flash path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from glimpseprune_tpu.ops.pallas.flash_attention import (
        _reference_attention,
        flash_attention,
    )

    rng = np.random.default_rng(2)
    B, Hq, Hkv, S, D = 1, 4, 2, 640, 32
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    seg = jnp.zeros((B, S), jnp.int32).at[:, -64:].set(-1)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, seg, seg, causal=True,
                                interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, seg, seg, True, D ** -0.5) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_window_attention_matches_unfused():
    """Rope+window fused kernel (interpret) == rope-then-window XLA path,
    and the rotate_half matrix reproduces ops/rope.rotate_half."""
    import numpy as np

    from glimpseprune_tpu.ops import attention as A
    from glimpseprune_tpu.ops.pallas.window_attention import rotate_half_matrix
    from glimpseprune_tpu.ops.rope import rotate_half, vision_rope_cos_sin

    rng = np.random.default_rng(0)
    P, H, D, wp = 128, 4, 16, 32
    qkv = jnp.asarray(rng.normal(size=(P, 3, H, D)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 9, (P, 2)).astype(np.int32))
    cos, sin = vision_rope_cos_sin(pos, D)
    valid = jnp.asarray(rng.random(P) > 0.2)

    x = jnp.asarray(rng.normal(size=(5, D)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(x @ rotate_half_matrix(D)), np.asarray(rotate_half(x)),
        rtol=1e-6,
    )

    old = A.ATTENTION_IMPL
    try:
        A.set_attention_impl("xla")
        ref = A.fused_window_attention(qkv, cos, sin, valid, wp)
        A.set_attention_impl("flash_interpret")
        got = A.fused_window_attention(qkv, cos, sin, valid, wp)
    finally:
        A.set_attention_impl(old)
    ref, got = np.asarray(ref), np.asarray(got)
    vm = np.asarray(valid)
    np.testing.assert_allclose(got[vm], ref[vm], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nw", [16, 13, 3])
def test_fused_window_attention_merged_groups_match(nw):
    """wins_per_step > 1 (several windows per grid step, block-diagonal
    mask; r5 chip sweep) is bit-identical to the one-window-per-step
    kernel, including window counts that pad up to the group size and
    counts below it (W clamps to nw)."""
    import numpy as np

    from glimpseprune_tpu.ops.pallas.window_attention import (
        window_attention_fused,
    )
    from glimpseprune_tpu.ops.rope import vision_rope_cos_sin

    rng = np.random.default_rng(1)
    wp, H, D = 64, 4, 80
    P = nw * wp
    qkv = jnp.asarray(rng.normal(size=(P, 3, H, D)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 31, (P, 2)).astype(np.int32))
    cos, sin = vision_rope_cos_sin(pos, D)
    valid = jnp.asarray(rng.random(P) > 0.1)
    one = window_attention_fused(qkv, cos, sin, valid, wp, interpret=True,
                                 wins_per_step=1)
    grp = window_attention_fused(qkv, cos, sin, valid, wp, interpret=True,
                                 wins_per_step=8)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(grp))


def test_fuser_cond_attention_flash_matches_dense():
    """CondSdpaAttention's flash path (streams the [N, N] scores — the dense
    f32 matrix is 4 GB/row at 16k tokens) == the dense XLA path on valid
    rows; padding rows differ by design (flash zeroes, dense self-attends)
    and are masked downstream."""
    import numpy as np

    from glimpseprune_tpu.gp.fuser import CondSdpaAttention
    from glimpseprune_tpu.ops import attention as A
    from glimpseprune_tpu.ops.rope import vision_rope_cos_sin

    rng = np.random.default_rng(0)
    B, N, HID, COND, H = 2, 256, 32, 16, 2
    x = jnp.asarray(rng.standard_normal((B, N, HID)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, N, COND)), jnp.float32)
    seg = jnp.asarray(
        np.where(rng.random((B, N)) < 0.1, -1, rng.integers(0, 3, (B, N))),
        jnp.int32,
    )
    pos = jnp.asarray(rng.integers(0, 16, (N, 2)), jnp.int32)
    dqk = (HID + COND) // H
    cos, sin = vision_rope_cos_sin(pos, dqk)
    cos, sin = cos[None], sin[None]
    valid = seg >= 0

    mod = CondSdpaAttention(HID, COND, H)
    params = mod.init(jax.random.PRNGKey(0), x, cond, seg, cos, sin, valid)

    old = A.ATTENTION_IMPL
    try:
        A.set_attention_impl("xla")
        ref = mod.apply(params, x, cond, seg, cos, sin, valid)
        A.set_attention_impl("flash_interpret")
        got = mod.apply(params, x, cond, seg, cos, sin, valid)
    finally:
        A.set_attention_impl(old)
    vm = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(got)[vm], np.asarray(ref)[vm], rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_tile_skip_multi_segment(causal):
    """Small blocks force a multi-tile grid where whole tiles have no
    overlapping segments (and all-padding tiles): the per-tile skip must be
    numerically invisible."""
    rng = np.random.default_rng(1)
    b, h, s, d = 2, 2, 512, 64
    q = jnp.array(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.array(rng.normal(size=(b, h, s, d)).astype(np.float32))
    seg = np.zeros((b, s), dtype=np.int32)
    seg[:, 200:380] = 1          # segment boundaries off tile boundaries
    seg[:, 380:] = 2
    seg[:, -64:] = -1            # a full tile of padding
    seg = jnp.array(seg)

    out = flash_attention(q, k, v, seg, seg, causal=causal,
                          block_q=64, block_k=64, interpret=True)
    ref = reference_attention(q, k, v, seg, seg, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_dense_matches_masked(causal):
    """dense=True (static single-segment promise, no seg refs compiled) must
    equal the seg path on an all-one-segment input."""
    rng = np.random.default_rng(2)
    b, h, s, d = 1, 2, 256, 80
    q = jnp.array(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.array(rng.normal(size=(b, h, s, d)).astype(np.float32))
    seg = jnp.zeros((b, s), jnp.int32)

    ref = flash_attention(q, k, v, seg, seg, causal=causal,
                          block_q=128, block_k=128, interpret=True)
    out = flash_attention(q, k, v, None, None, causal=causal,
                          block_q=128, block_k=128, interpret=True, dense=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-6, atol=2e-6)

    # unaligned seq: the dense promise must silently fall back to the seg
    # path (block padding would otherwise be unmasked)
    s2 = 130
    q2, k2, v2 = q[:, :, :s2], k[:, :, :s2], v[:, :, :s2]
    seg2 = jnp.zeros((b, s2), jnp.int32)
    ref2 = flash_attention(q2, k2, v2, seg2, seg2, causal=causal,
                           block_q=128, block_k=128, interpret=True)
    out2 = flash_attention(q2, k2, v2, None, None, causal=causal,
                           block_q=128, block_k=128, interpret=True, dense=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("pv", [False, True])
def test_flash_int8_qk_close_to_bf16(causal, dense, pv):
    """int8-QK serving tier (qkv_int8=True): per-row symmetric q/k
    quantization + int32 MXU dot + rank-1 rescale must track the bf16
    kernel within the quantization step; masking semantics identical.
    pv=True additionally runs the PV dot in int8 (static-1/127 p,
    per-column v) — the 'all' tier."""
    rng = np.random.default_rng(11)
    b, hq, hkv, sq, skv, d = 1, 4, 2, 256, 256, 80
    q = jnp.asarray(rng.standard_normal((b, hq, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), jnp.float32)
    if dense:
        qseg = jnp.zeros((b, sq), jnp.int32)
        kseg = jnp.zeros((b, skv), jnp.int32)
    else:
        # two segments + padding tail
        seg = np.zeros((b, sq), np.int32)
        seg[:, sq // 2:] = 1
        seg[:, -17:] = -1
        qseg = kseg = jnp.asarray(seg)

    bf16 = flash_attention(q, k, v, qseg, kseg, causal=causal,
                           block_q=128, block_k=128, interpret=True,
                           dense=dense)
    i8 = flash_attention(q, k, v, qseg, kseg, causal=causal,
                         block_q=128, block_k=128, interpret=True,
                         dense=dense, qkv_int8=True, pv_int8=pv)
    a = np.asarray(bf16, np.float64).reshape(-1)
    c = np.asarray(i8, np.float64).reshape(-1)
    cos = (a @ c) / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12)
    assert cos > (0.998 if pv else 0.999), cos
    assert float(np.max(np.abs(a - c))) < (0.25 if pv else 0.15)
    if not dense:
        # padding rows stay exactly zero through the int8 path
        assert np.abs(np.asarray(i8)[:, :, -17:]).max() == 0.0


def test_flash_int8_default_block_k_bump_parity():
    """The qkv_int8 tier defaults block_k to 2048 when the kv sequence
    fills it (int8 tiles halve VMEM; r3 ladder 156->433 TF/s on the ViT
    full-att shape). Tiling must not change semantics: the auto-bumped
    default equals an explicit block_k=1024 run on a >1024-kv case with a
    padding tail crossing the 2048-block boundary."""
    rng = np.random.default_rng(5)
    b, hq, hkv, sq, skv, d = 1, 2, 1, 256, 2050, 64
    q = jnp.asarray(rng.standard_normal((b, hq, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), jnp.float32)
    qseg = jnp.zeros((b, sq), jnp.int32)
    kseg_np = np.zeros((b, skv), np.int32)
    kseg_np[:, -30:] = -1  # padding tail inside the last 2048-block
    kseg = jnp.asarray(kseg_np)

    # qk-only: q/k quantization is per-ROW (tiling-invariant), so the
    # auto-bumped default must match an explicit block_k=1024 run exactly
    # up to f32 accumulation order
    auto = flash_attention(q, k, v, qseg, kseg, interpret=True,
                           qkv_int8=True)
    pinned = flash_attention(q, k, v, qseg, kseg, interpret=True,
                             block_k=1024, qkv_int8=True)
    np.testing.assert_allclose(np.asarray(auto, np.float32),
                               np.asarray(pinned, np.float32),
                               rtol=1e-4, atol=1e-4)

    # +pv: v quantizes per-column PER TILE, so the grid legitimately moves
    # with block_k — check closeness to the bf16 kernel instead
    allpv = flash_attention(q, k, v, qseg, kseg, interpret=True,
                            qkv_int8=True, pv_int8=True)
    bf16 = flash_attention(q, k, v, qseg, kseg, interpret=True)
    a = np.asarray(bf16, np.float64).reshape(-1)
    c = np.asarray(allpv, np.float64).reshape(-1)
    cos = (a @ c) / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12)
    assert cos > 0.998, cos
    # padding tail stays exactly zero through the bumped-block int8 path
    assert np.abs(np.asarray(allpv)[:, :, :, :]).max() > 0
    assert np.abs(np.asarray(
        flash_attention(k.repeat(2, axis=1), k, v, kseg, kseg,
                        interpret=True, qkv_int8=True)
        )[:, :, -30:]).max() == 0.0


def test_flash_pallas_backward_matches_reference_bidirectional():
    """FlashAttention-2-style pallas backward (interpret) == XLA-reference
    grads on the ViT-like case: bidirectional, multi-segment, padding."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from glimpseprune_tpu.ops.pallas.flash_attention import (
        _reference_attention,
        flash_attention,
    )

    rng = np.random.default_rng(5)
    B, H, S, D = 1, 2, 512, 32
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    seg = np.zeros((B, S), np.int32)
    seg[:, 200:420] = 1
    seg[:, 420:] = -1  # padding tail
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, seg, seg, causal=False,
                                interpret=True, block_q=128, block_k=128)
                * jnp.cos(jnp.arange(D))).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, seg, seg, False, D ** -0.5)
                * jnp.cos(jnp.arange(D))).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_pallas_backward_dense_and_rectangular():
    """Backward through the dense fast path and a rectangular Sq != Skv."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from glimpseprune_tpu.ops.pallas.flash_attention import (
        _reference_attention,
        flash_attention,
    )

    rng = np.random.default_rng(6)
    B, Hq, Hkv, D = 1, 4, 2, 32
    Sq, Skv = 256, 512
    q = jnp.asarray(rng.normal(size=(B, Hq, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, Skv, D)), jnp.float32)
    segq = jnp.zeros((B, Sq), jnp.int32)
    segk = jnp.zeros((B, Skv), jnp.int32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, segq, segk, causal=False,
                                interpret=True, block_q=128, block_k=128,
                                dense=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, segq, segk, False,
                                     D ** -0.5) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_backward_mode_toggle():
    """set_flash_backward("xla") reproduces the old recompute backward;
    both modes agree (same math, different schedule)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import importlib

    fa = importlib.import_module("glimpseprune_tpu.ops.pallas.flash_attention")

    rng = np.random.default_rng(7)
    B, H, S, D = 1, 2, 640, 32
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    seg = jnp.zeros((B, S), jnp.int32).at[:, -100:].set(-1)

    def loss(q, k, v):
        return (fa.flash_attention(q, k, v, seg, seg, causal=True,
                                   interpret=True) ** 2).sum()

    try:
        fa.set_flash_backward("pallas")
        gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        fa.set_flash_backward("xla")
        gx = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.set_flash_backward("pallas")
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_qpos_backward_matches_monolithic_grads():
    """Sharded-Q causal flash (q_positions) is now differentiable: dq of a
    shard == the corresponding slice of the monolithic dq, and the kv grads
    sum across shards to the monolithic dk/dv (linearity of the vjp)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(8)
    B, Hq, Hkv, S, D = 1, 4, 2, 512, 32
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    seg = jnp.zeros((B, S), jnp.int32).at[:, :23].set(-1)  # left padding
    w = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

    def loss_full(q, k, v):
        o = flash_attention(q, k, v, seg, seg, causal=True, interpret=True,
                            block_q=128, block_k=128)
        return (o * w).sum()

    gq_full, gk_full, gv_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)

    n, sl = 4, S // 4
    gk_sum = jnp.zeros_like(k)
    gv_sum = jnp.zeros_like(v)
    for i in range(n):
        qpos = jnp.broadcast_to(i * sl + jnp.arange(sl), (B, sl))

        def loss_shard(qi, k, v):
            o = flash_attention(qi, k, v, seg[:, i * sl:(i + 1) * sl], seg,
                                causal=True, interpret=True, block_q=128,
                                block_k=128, q_positions=qpos)
            return (o * w).sum()

        gqi, gki, gvi = jax.grad(loss_shard, argnums=(0, 1, 2))(
            q[:, :, i * sl:(i + 1) * sl], k, v)
        np.testing.assert_allclose(
            np.asarray(gqi), np.asarray(gq_full[:, :, i * sl:(i + 1) * sl]),
            atol=1e-4, err_msg=f"dq shard {i}")
        gk_sum = gk_sum + gki
        gv_sum = gv_sum + gvi
    np.testing.assert_allclose(np.asarray(gk_sum), np.asarray(gk_full), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv_sum), np.asarray(gv_full), atol=1e-4)


def test_flash_qpos_backward_mode_toggle():
    """set_flash_backward('xla') covers the q_positions path too: both
    backward modes agree on sharded-Q grads."""
    import importlib
    import numpy as np
    import jax
    import jax.numpy as jnp

    fa = importlib.import_module("glimpseprune_tpu.ops.pallas.flash_attention")

    rng = np.random.default_rng(9)
    B, H, S, D = 1, 2, 256, 32
    sl = 64
    q = jnp.asarray(rng.normal(size=(B, H, sl, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    qseg = jnp.zeros((B, sl), jnp.int32)
    kseg = jnp.zeros((B, S), jnp.int32).at[:, :11].set(-1)
    qpos = jnp.broadcast_to(128 + jnp.arange(sl), (B, sl))

    def loss(q, k, v):
        o = fa.flash_attention(q, k, v, qseg, kseg, causal=True,
                               interpret=True, block_q=64, block_k=64,
                               q_positions=qpos)
        return (o ** 2).sum()

    try:
        fa.set_flash_backward("pallas")
        gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        fa.set_flash_backward("xla")
        gx = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.set_flash_backward("pallas")
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
