"""Unit tests: keep policy + compaction vs a NumPy oracle implementing the
reference `_get_remain_masks`/`_reduce_tokens` semantics (SURVEY.md §4a)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.ops.keep_policy import (
    anchor_mask_from_grid,
    keep_scores_with_policy,
    select_keep_mask,
)
from glimpseprune_tpu.ops.compaction import (
    compaction_indices,
    gather_kv,
    gather_positions,
    gather_tokens,
)
from glimpseprune_tpu.ops.rope import mrope_cos_sin, vision_rope_cos_sin
from glimpseprune_tpu.ops.attention import (
    causal_segment_attention,
    decode_attention,
    segment_attention,
)


def oracle_keep(probs, threshold, max_ratio, min_num, anchors=()):
    """Reference _get_remain_masks semantics, one row, numpy."""
    keep = probs > threshold
    n = probs.shape[0]
    if max_ratio is not None:
        cnt = keep.sum()
        if cnt / n > max_ratio:
            k = int(max_ratio * n)
            idx = np.argsort(-probs, kind="stable")[:k]
            keep = np.zeros_like(keep)
            keep[idx] = True
    if min_num is not None and keep.sum() < min_num:
        idx = np.argsort(-probs, kind="stable")[:min_num]
        keep[idx] = True
    for a in anchors:
        keep[a] = True
    return keep


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize(
    "threshold,max_ratio,min_num",
    [(0.5, None, 1), (0.5, 0.25, 1), (0.9, 0.1, 4), (0.999, 0.5, 3), (0.0, 0.111, 1)],
)
def test_keep_policy_matches_oracle(seed, threshold, max_ratio, min_num):
    rng = np.random.default_rng(seed)
    n = 48
    probs = rng.random((3, n)).astype(np.float32)
    valid = np.ones((3, n), dtype=bool)
    keep = keep_scores_with_policy(
        jnp.array(probs), jnp.array(valid), threshold, max_ratio, min_num
    )
    keep = np.asarray(keep)
    for b in range(3):
        expected = oracle_keep(probs[b], threshold, max_ratio, min_num)
        np.testing.assert_array_equal(keep[b], expected, err_msg=f"row {b}")


def test_keep_policy_respects_valid_mask():
    probs = jnp.ones((1, 10)) * 0.9
    valid = jnp.array([[True] * 6 + [False] * 4])
    keep = keep_scores_with_policy(probs, valid, 0.5, 0.5, 1)
    keep = np.asarray(keep)
    assert not keep[0, 6:].any()
    assert keep[0, :6].sum() == 3  # floor(0.5 * 6)


def test_anchor_mask():
    grid = jnp.array([[3, 4]])  # h=3, w=4 -> 12 tokens
    m = anchor_mask_from_grid(grid, 12, ("tl", "tr", "bl", "br"))
    m = np.asarray(m)[0]
    assert set(np.nonzero(m)[0].tolist()) == {0, 3, 8, 11}


def test_compaction_left_pads_and_preserves_order():
    keep = jnp.array(
        [
            [True, False, True, True, False],
            [False, False, False, False, True],
        ]
    )
    plan = compaction_indices(keep, out_len=4)
    x = jnp.arange(10).reshape(2, 5)
    out = np.asarray(gather_tokens(x, plan, fill=-1))
    # row 0 keeps positions 0,2,3 -> left-pad 1
    np.testing.assert_array_equal(out[0], [-1, 0, 2, 3])
    # row 1 keeps position 4 -> left-pad 3
    np.testing.assert_array_equal(out[1], [-1, -1, -1, 9])
    np.testing.assert_array_equal(np.asarray(plan.n_kept), [3, 1])


def test_compaction_positions_gathered_not_renumbered():
    keep = jnp.array([[True, False, True, True]])
    pos = jnp.arange(4)[None, None, :] * jnp.ones((3, 1, 1), dtype=jnp.int32) * 10
    plan = compaction_indices(keep, out_len=3)
    out = np.asarray(gather_positions(pos, plan))
    np.testing.assert_array_equal(out[0, 0], [0, 20, 30])


def test_compaction_kv():
    keep = jnp.array([[False, True, True]])
    kv = jnp.arange(2 * 1 * 3 * 2 * 2).reshape(2, 1, 3, 2, 2).astype(jnp.float32)
    plan = compaction_indices(keep, out_len=2)
    out = gather_kv(kv, plan)
    assert out.shape == (2, 1, 2, 2, 2)
    np.testing.assert_array_equal(np.asarray(out)[0, 0], np.asarray(kv)[0, 0, 1:])


def test_mrope_cos_sin_matches_hf():
    import torch
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLRotaryEmbedding,
        apply_multimodal_rotary_pos_emb,
    )
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig

    cfg = Qwen2_5_VLConfig(
        hidden_size=64,
        num_attention_heads=4,
        rope_theta=1e6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    )
    rot = Qwen2_5_VLRotaryEmbedding(cfg)
    rng = np.random.default_rng(0)
    pos = rng.integers(0, 50, size=(3, 2, 7))
    x = torch.zeros(2, 7, 64)
    hf_cos, hf_sin = rot(x, torch.tensor(pos))
    q = torch.tensor(rng.normal(size=(2, 4, 7, 16)).astype(np.float32))
    k = torch.tensor(rng.normal(size=(2, 2, 7, 16)).astype(np.float32))
    hf_q, hf_k = apply_multimodal_rotary_pos_emb(q, k, hf_cos, hf_sin, [2, 3, 3])

    cos, sin = mrope_cos_sin(jnp.array(pos), 16, 1e6, (2, 3, 3))
    from glimpseprune_tpu.ops.rope import apply_rotary

    ours_q = apply_rotary(jnp.array(q.numpy().transpose(0, 2, 1, 3)), cos, sin)
    ours_k = apply_rotary(jnp.array(k.numpy().transpose(0, 2, 1, 3)), cos, sin)
    np.testing.assert_allclose(
        np.asarray(ours_q), hf_q.numpy().transpose(0, 2, 1, 3), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_k), hf_k.numpy().transpose(0, 2, 1, 3), rtol=1e-5, atol=1e-5
    )


def test_segment_attention_blocks():
    rng = np.random.default_rng(0)
    s, h, d = 12, 2, 8
    q = jnp.array(rng.normal(size=(s, h, d)).astype(np.float32))
    k = jnp.array(rng.normal(size=(s, h, d)).astype(np.float32))
    v = jnp.array(rng.normal(size=(s, h, d)).astype(np.float32))
    seg = jnp.array([0] * 6 + [1] * 6)
    out = segment_attention(q, k, v, seg)
    # block 0 must be independent of block 1 contents
    v2 = v.at[6:].set(0.0)
    out2 = segment_attention(q, k, v2, seg)
    np.testing.assert_allclose(np.asarray(out[:6]), np.asarray(out2[:6]), rtol=1e-6)
    assert not np.allclose(np.asarray(out[6:]), np.asarray(out2[6:]))


def test_causal_vs_decode_attention_consistency():
    """Prefill attention at the last position == decode attention over the cache."""
    rng = np.random.default_rng(1)
    b, s, hq, hkv, d = 2, 6, 4, 2, 8
    q = jnp.array(rng.normal(size=(b, s, hq, d)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.array(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    valid = jnp.array([[False] + [True] * 5, [True] * 6])  # left pad row 0
    full = causal_segment_attention(q, k, v, valid)
    dec = decode_attention(q[:, -1:], k, v, valid)
    np.testing.assert_allclose(
        np.asarray(full[:, -1:]), np.asarray(dec), rtol=1e-5, atol=1e-5
    )
