"""End-to-end GP pipeline probes (SURVEY.md §4b/c):

- all-kept pruning must reproduce the vanilla model exactly
- use_ref_masks / use_zero_masks oracle modes
- pruned generate runs and respects the budget
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.models.qwen2_5_vl.runner import (
    GlimpsePruneRunner,
    prepare_inputs,
)


def make_image(rng, h=64, w=96):
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def make_prompts(cfg, rng, b=2):
    prompts = []
    for _ in range(b):
        n_pre = int(rng.integers(2, 6))
        n_post = int(rng.integers(2, 6))
        prompts.append(
            [int(x) for x in rng.integers(5, 400, n_pre)]
            + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
            + [int(x) for x in rng.integers(5, 400, n_post)]
        )
    return prompts


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prompts = make_prompts(cfg, rng)
    images = [make_image(rng, 64, 96), make_image(rng, 56, 56)]
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
    model = Qwen2_5_VL_GP(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids),
        jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids),
        jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids),
        jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid),
        jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots),
        jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index),
        jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids),
        jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start),
        prep.out_len,
    )
    return cfg, variables["params"], prompts, images, rng


def test_all_kept_equals_vanilla(setup):
    """keep-everything pruning ≡ the unpruned model (logit-level)."""
    cfg, params, prompts, images, rng = setup
    cfg_all = cfg.replace_gp(max_remain_ratio=None, reduce_threshold=-1.0)
    runner = GlimpsePruneRunner(cfg_all, params)
    prep = prepare_inputs(cfg_all, prompts, images, seq_multiple=8, patch_multiple=16)

    out = runner.glimpse(prep)
    assert np.asarray(out.keep_img)[np.asarray(prep.img_valid)].all()

    # pruned-path logits at the final position vs vanilla prefill
    r1 = runner.generate(prep, max_new_tokens=5, do_selection=True)
    r2 = runner.generate(prep, max_new_tokens=5, do_selection=False)
    np.testing.assert_array_equal(r1.sequences, r2.sequences)


def test_ref_masks_drive_pruning(setup):
    cfg, params, prompts, images, rng = setup
    runner = GlimpsePruneRunner(cfg, params)
    bboxes = [[[0.0, 0.0, 0.5, 0.5]], [[0.25, 0.25, 1.0, 1.0]]]
    prep = prepare_inputs(cfg, prompts, images, normed_bboxes=bboxes,
                          seq_multiple=8, patch_multiple=16)
    out = runner.glimpse(prep, use_ref_masks=True)
    keep = np.asarray(out.keep_img)
    ref = prep.ref_token_masks
    # policy cap may drop some ref tokens; but nothing outside ref is kept
    # (min_remain floor can only pick top-prob = ref tokens, sigmoid(inf)=1)
    assert (keep & ~ref)[np.asarray(prep.img_valid)].sum() == 0
    assert keep.sum() > 0


def test_zero_masks_min_remain(setup):
    cfg, params, prompts, images, rng = setup
    cfg_zero = cfg.replace_gp(use_zero_masks=True, min_remain_num=2)
    runner = GlimpsePruneRunner(cfg_zero, params)
    prep = prepare_inputs(cfg_zero, prompts, images, seq_multiple=8, patch_multiple=16)
    out = runner.glimpse(prep)
    keep = np.asarray(out.keep_img)
    np.testing.assert_array_equal(keep.sum(1), [2, 2])


def test_pruned_generate_budget_and_shapes(setup):
    cfg, params, prompts, images, rng = setup
    runner = GlimpsePruneRunner(cfg, params)  # max_remain_ratio=0.5
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
    res = runner.generate(prep, max_new_tokens=6, do_selection=True)
    assert res.sequences.shape == (2, 6)
    n_img = prep.n_img_tokens
    kept = res.keep_img.sum(1)
    assert (kept <= np.floor(0.5 * n_img) + 1).all()
    assert (res.prune_ratio >= 0.45).all()


def test_glimpse_mask_logits_shape(setup):
    cfg, params, prompts, images, rng = setup
    runner = GlimpsePruneRunner(cfg, params)
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
    out = runner.glimpse(prep)
    # eval mode: ori_attn_supervision row + final row
    n_out = 1 + 1  # ori_attn + last fuser layer (deep_supervision only in training)
    assert out.mask_logits.shape[0] == n_out
    assert out.mask_logits.shape[1:] == prep.img_valid.shape


def test_decode_chunk_boundaries_consistent(setup):
    """Chunked decode produces identical tokens regardless of chunk size."""
    cfg, params, prompts, images, rng = setup
    runner = GlimpsePruneRunner(cfg, params)
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
    out = runner._prefill({"params": params}, runner._device_inputs(prep, False),
                          out_len=prep.out_len, use_ref_masks=False)
    args = (out.logits, out.valid, out.position_ids, out.kv_k, out.kv_v)
    s_big, n_big = runner._decode_loop(*args, 7, cfg.eos_token_id, chunk_size=7)
    s_small, n_small = runner._decode_loop(*args, 7, cfg.eos_token_id, chunk_size=2)
    np.testing.assert_array_equal(s_big, s_small)
    np.testing.assert_array_equal(n_big, n_small)


def test_stream_generate_matches_generate(setup):
    """Streaming decode (reference demo_gp.py streamer) emits exactly the
    batch generate() tokens, incrementally."""
    cfg, params, prompts, images, rng = setup
    import jax

    runner = GlimpsePruneRunner(cfg, params)
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)

    full = runner.generate(prep, max_new_tokens=8, do_selection=True,
                           rng=jax.random.PRNGKey(0))

    gen = runner.stream_generate(prep, max_new_tokens=8, chunk_size=3,
                                 rng=jax.random.PRNGKey(0))
    chunks, res = [], None
    while True:
        try:
            chunks.append(next(gen))
        except StopIteration as stop:
            res = stop.value
            break
    streamed = np.concatenate(chunks, axis=1)[:, :8]
    np.testing.assert_array_equal(res.sequences, full.sequences)
    # pre-trim streamed tokens must agree on every generated position
    for b in range(full.sequences.shape[0]):
        n = int(full.num_generated[b])
        np.testing.assert_array_equal(streamed[b, :n], full.sequences[b, :n])
    np.testing.assert_array_equal(res.keep_img, full.keep_img)
