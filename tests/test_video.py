"""Video inputs: temporal patchify, video mRoPE, GP pipeline end to end.

Reference: the Qwen2.5-VL family handles video grids (grid_t > 1) through the
same processor/model path — second_per_grid_ts scales the mRoPE time axis
(get_rope_index video branch), the ViT treats frames as separate
full-attention segments, and GP prunes the video token span like any other
visual (SURVEY.md §2.1; VERDICT round-1 missing #8).
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
from glimpseprune_tpu.preprocessing.image import patchify_image, preprocess_video


def make_video(rng, t, h, w):
    return rng.integers(0, 255, (t, h, w, 3), dtype=np.uint8)


def test_preprocess_video_grid_and_patch_parity():
    """Video patchify == HF image-processor semantics per temporal pair."""
    rng = np.random.default_rng(0)
    frames = make_video(rng, 4, 56, 84)
    patches, grid = preprocess_video(frames, patch_size=14, temporal_patch_size=2,
                                     merge_size=2)
    assert grid == (2, 4, 6)
    assert patches.shape == (2 * 4 * 6, 3 * 2 * 14 * 14)

    # odd frame count: last frame repeated into the final temporal pair
    p3, g3 = preprocess_video(frames[:3], patch_size=14, temporal_patch_size=2,
                              merge_size=2)
    assert g3 == (2, 4, 6)
    from glimpseprune_tpu.preprocessing.image import normalize_image

    ref, _ = patchify_image(
        normalize_image(np.concatenate([frames[:3], frames[2:3]])), 14, 2, 2
    )
    np.testing.assert_allclose(p3, ref)


def test_video_rope_matches_hf():
    """get_rope_index video branch + second_per_grid_ts vs HF."""
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )

    from glimpseprune_tpu.preprocessing import get_rope_index

    cfg = Qwen2_5_VLConfig(
        vocab_size=600, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=4, intermediate_size=64,
            patch_size=14, window_size=56, spatial_merge_size=2,
            fullatt_block_indexes=[1], out_hidden_size=64,
        ),
        image_token_id=500, video_token_id=501,
        vision_start_token_id=498, vision_end_token_id=499,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg)

    # row 0: one video (t=2, 4x6 merged 2x3 = 12 tokens); row 1: image + video
    video_grid = np.array([[2, 4, 6], [2, 2, 4]])
    image_grid = np.array([[1, 2, 4]])
    rows = [
        [7, 8, 498] + [501] * 12 + [499, 9],
        [7, 498] + [500] * 2 + [499, 11, 498] + [501] * 4 + [499, 12, 13],
    ]
    L = max(len(r) for r in rows) + 3
    ids = np.zeros((2, L), dtype=np.int64)
    mask = np.zeros((2, L), dtype=np.int64)
    for b, row in enumerate(rows):
        ids[b, L - len(row):] = row
        mask[b, L - len(row):] = 1
    spg = [0.5, 2.0]

    hf_pos, hf_delta = model.model.get_rope_index(
        torch.tensor(ids), torch.tensor(image_grid), torch.tensor(video_grid),
        torch.tensor(spg, dtype=torch.float32), torch.tensor(mask),
    )
    # the HF CLASS default is tokens_per_second=4; released Qwen2.5-VL
    # checkpoints set 2 (our default) — pin 4 here to compare like for like
    ours_pos, ours_delta = get_rope_index(
        ids, image_grid, video_grid, mask, second_per_grid_ts=spg,
        image_token_id=500, video_token_id=501, vision_start_token_id=498,
        tokens_per_second=4.0,
    )
    np.testing.assert_array_equal(ours_pos, hf_pos.numpy())
    np.testing.assert_array_equal(ours_delta, hf_delta.numpy())


@pytest.fixture(scope="module")
def video_setup():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    # row 0: video only; row 1: image + video (marker order)
    prompts = [
        [7, 8, cfg.vision_start_token_id, cfg.video_token_id,
         cfg.vision_end_token_id, 9],
        [7, cfg.vision_start_token_id, cfg.image_token_id,
         cfg.vision_end_token_id, 11, cfg.vision_start_token_id,
         cfg.video_token_id, cfg.vision_end_token_id, 12],
    ]
    images = [None, rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)]
    videos = [make_video(rng, 4, 64, 96), make_video(rng, 2, 56, 56)]
    prep = prepare_inputs(
        cfg, prompts, images, videos=videos, video_seconds_per_grid=[1.0, 1.0],
        seq_multiple=8, patch_multiple=16,
    )
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
    return cfg, prep, runner


def test_video_prep_geometry(video_setup):
    cfg, prep, _ = video_setup
    # row 0 video: 64x96 -> 56x84 -> grid (2,4,6) -> 2*2*3 = 12 merged tokens
    # row 1: image 56x56 -> 4 tokens + video (1,2,2)->... 56x56 t=2 -> grid (1,2,2)? no:
    # t=2 frames -> grid_t=1, 2x2 merged = 4 tokens; total 8
    assert prep.n_img_tokens[0] == 12
    assert prep.n_img_tokens[1] == 8
    # one budget group per visual: row 1 has groups {0, 1}
    g = prep.img_group[1][prep.img_valid[1]]
    assert set(g.tolist()) == {0, 1}
    # video tokens carry the video token id
    row0 = prep.input_ids[0][prep.valid[0]]
    assert (row0 == cfg.video_token_id).sum() == 12
    # temporal mRoPE: frame 1 of row-0 video sits 1.0 * tokens_per_second(=2)
    # time steps above frame 0
    vid_slots = prep.img_slots[0][prep.img_valid[0]]
    t_pos = prep.position_ids[0, 0, vid_slots]
    assert t_pos[6:].min() - t_pos[:6].max() == 2


def test_video_gp_pipeline(video_setup):
    cfg, prep, runner = video_setup
    out = runner.glimpse(prep)
    keep = np.asarray(out.keep_img)
    # per-group budgets: every visual respects its own cap
    for b in range(2):
        assert keep[b].sum() <= prep.n_img_tokens[b]
        assert keep[b, ~prep.img_valid[b]].sum() == 0
    res = runner.generate(prep, max_new_tokens=4)
    assert res.sequences.shape == (2, 4)
    assert (res.prune_ratio >= 0).all()
