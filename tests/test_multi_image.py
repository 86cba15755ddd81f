"""Multi-image rows: per-image budgets + grouped keep policy (SURVEY.md §7
hard parts; reference notebook multi-image usage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner, prepare_inputs
from glimpseprune_tpu.ops.keep_policy import keep_scores_with_policy_grouped


def test_grouped_policy_matches_per_group_oracle():
    from test_ops import oracle_keep

    rng = np.random.default_rng(0)
    # one row, two groups of 20 and 12 tokens
    sizes = [20, 12]
    probs = rng.random(sum(sizes)).astype(np.float32)
    groups = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])
    keep = keep_scores_with_policy_grouped(
        jnp.array(probs)[None], jnp.ones((1, 32), dtype=bool),
        jnp.array(groups)[None], 0.7, 0.25, 2,
    )
    keep = np.asarray(keep)[0]
    off = 0
    for s in sizes:
        expected = oracle_keep(probs[off : off + s], 0.7, 0.25, 2)
        np.testing.assert_array_equal(keep[off : off + s], expected)
        off += s


def test_multi_image_prepare_and_generate():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    # row 0: two images; row 1: one image
    prompts = [
        [7, cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id,
         8, cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id, 9],
        [10, cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id, 11],
    ]
    images = [
        [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8),
         rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)],
        rng.integers(0, 255, (96, 64, 3), dtype=np.uint8),
    ]
    bboxes = [
        [[[0.0, 0.0, 0.5, 1.0]], [[0.5, 0.5, 1.0, 1.0]]],  # per image
        [[0.0, 0.0, 1.0, 0.5]],
    ]
    prep = prepare_inputs(cfg, prompts, images, normed_bboxes=bboxes,
                          seq_multiple=8, patch_multiple=16)
    # row 0 has both images' tokens
    n0 = int(prep.n_img_tokens[0])
    assert n0 == (prep.grid_hw_rows[0][0][0] * prep.grid_hw_rows[0][0][1]
                  + prep.grid_hw_rows[0][1][0] * prep.grid_hw_rows[0][1][1])
    assert (np.asarray(prep.img_group[0, :n0]) >= 0).all()
    assert set(prep.img_group[0, :n0].tolist()) == {0, 1}
    # ref masks cover both images' spans
    sp0 = prep.grid_hw_rows[0][0][0] * prep.grid_hw_rows[0][0][1]
    assert prep.ref_token_masks[0, :sp0].any()
    assert prep.ref_token_masks[0, sp0:n0].any()

    model = Qwen2_5_VL_GP(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index), jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start), prep.out_len,
    )
    runner = GlimpsePruneRunner(cfg, variables["params"])
    res = runner.generate(prep, max_new_tokens=4)
    assert res.sequences.shape == (2, 4)

    # per-image budget honored: each image keeps <= floor(0.5 * its tokens) + 1
    keep = res.keep_img
    g = np.asarray(prep.img_group)
    for b in range(2):
        for gi in set(g[b][g[b] >= 0].tolist()):
            sel = g[b] == gi
            n_tok = int(sel.sum())
            assert keep[b][sel].sum() <= int(0.5 * n_tok) + 1

    # ref-mask mode respects per-image masks
    out = runner.glimpse(prep, use_ref_masks=True)
    k = np.asarray(out.keep_img)
    assert (k & ~prep.ref_token_masks).sum() == 0
