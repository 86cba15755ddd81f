"""Preprocessing parity vs the HF Qwen2.5-VL processor (CPU torch oracle)."""

import numpy as np
import pytest

from glimpseprune_tpu.preprocessing import (
    build_vision_geometry,
    cu_seqlens_from_grid,
    get_rope_index,
    get_window_index,
    preprocess_image,
    ref_token_mask_from_bboxes,
    smart_resize,
    vision_pos_ids,
)


@pytest.mark.parametrize(
    "h,w",
    [(224, 224), (480, 640), (1080, 1920), (98, 30), (29, 500), (3000, 2000)],
)
def test_smart_resize_matches_hf(h, w):
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    ours = smart_resize(h, w, factor=28)
    theirs = hf_smart_resize(h, w, factor=28)
    assert ours == tuple(theirs)


def test_patchify_matches_hf_image_processor():
    from transformers import Qwen2VLImageProcessor

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(97, 211, 3), dtype=np.uint8)

    proc = Qwen2VLImageProcessor(
        do_resize=True, patch_size=14, temporal_patch_size=2, merge_size=2
    )
    hf_out = proc(images=[img], return_tensors="np")
    hf_patches = hf_out["pixel_values"]
    hf_grid = hf_out["image_grid_thw"][0]

    ours, grid = preprocess_image(img)
    assert tuple(grid) == tuple(hf_grid)
    np.testing.assert_allclose(ours, hf_patches, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "grids",
    [
        [(1, 16, 16)],
        [(1, 16, 24)],
        [(1, 6, 8)],
        [(1, 18, 20), (1, 8, 12)],
        [(2, 16, 16)],
    ],
)
def test_window_index_matches_hf(grids):
    import torch
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )

    cfg = Qwen2_5_VLVisionConfig(
        depth=1, hidden_size=32, num_heads=4, intermediate_size=64,
        patch_size=14, window_size=112, spatial_merge_size=2,
        fullatt_block_indexes=[0], out_hidden_size=32,
    )
    vt = Qwen2_5_VisionTransformerPretrainedModel(cfg)
    grid = torch.tensor(grids)
    hf_idx, hf_cu = vt.get_window_index(grid)
    hf_cu = torch.unique_consecutive(torch.tensor(hf_cu))

    ours_idx, ours_cu = get_window_index(
        np.array(grids), window_size=112, spatial_merge_size=2, patch_size=14
    )
    np.testing.assert_array_equal(ours_idx, hf_idx.numpy())
    np.testing.assert_array_equal(ours_cu, hf_cu.numpy())


def test_vision_pos_ids_matches_hf():
    import torch
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )

    cfg = Qwen2_5_VLVisionConfig(
        depth=1, hidden_size=32, num_heads=4, intermediate_size=64,
        patch_size=14, window_size=112, spatial_merge_size=2,
        fullatt_block_indexes=[0], out_hidden_size=32,
    )
    vt = Qwen2_5_VisionTransformerPretrainedModel(cfg)
    grids = [(1, 8, 12), (1, 4, 6)]
    grid = torch.tensor(grids)

    # HF computes rot_pos_emb directly; recover pos ids from its internals
    # by comparing our pos-id-driven frequencies to HF's output.
    hf_emb = vt.rot_pos_emb(grid)  # [N, head_dim//2]
    pos = vision_pos_ids(np.array(grids), spatial_merge_size=2)
    dim = vt.rotary_pos_emb.inv_freq.shape[0]
    inv_freq = vt.rotary_pos_emb.inv_freq.numpy()
    ours = np.concatenate(
        [pos[:, 0:1] * inv_freq[None, :], pos[:, 1:2] * inv_freq[None, :]], axis=-1
    )
    np.testing.assert_allclose(ours, hf_emb.numpy(), rtol=1e-5, atol=1e-5)


def test_cu_seqlens():
    cu = cu_seqlens_from_grid(np.array([(1, 4, 6), (2, 2, 4)]))
    np.testing.assert_array_equal(cu, [0, 24, 32, 40])


def test_ref_token_mask_matches_reference_semantics():
    mask = ref_token_mask_from_bboxes([[0.0, 0.0, 0.5, 0.5]], (8, 8))
    assert mask[:5, :5].all()  # int(0.5*8)=4 inclusive
    assert not mask[5:, :].any() and not mask[:, 5:].any()
    # degenerate box still marks a cell
    mask2 = ref_token_mask_from_bboxes([[0.99, 0.99, 1.0, 1.0]], (4, 4))
    assert mask2[3, 3]
    assert mask2.sum() == 1


def test_get_rope_index_matches_hf():
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )

    cfg = Qwen2_5_VLConfig(
        vocab_size=600,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=4, intermediate_size=64,
            patch_size=14, window_size=56, spatial_merge_size=2,
            fullatt_block_indexes=[1], out_hidden_size=64,
        ),
        image_token_id=500,
        video_token_id=501,
        vision_start_token_id=498,
        vision_end_token_id=499,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg)

    # two rows, left padding, one image each (grids 4x6 and 2x4 merged -> 6 and 2 tokens)
    grid = np.array([[1, 4, 6], [1, 2, 4]])
    n_tok = [6, 2]
    rows = []
    for b, nt in enumerate(n_tok):
        row = [7, 8, 498] + [500] * nt + [499, 9, 10, 11]
        rows.append(row)
    L = max(len(r) for r in rows) + 2
    ids = np.zeros((2, L), dtype=np.int64)
    mask = np.zeros((2, L), dtype=np.int64)
    for b, row in enumerate(rows):
        ids[b, L - len(row):] = row
        mask[b, L - len(row):] = 1

    hf_pos, hf_delta = model.model.get_rope_index(
        torch.tensor(ids), torch.tensor(grid), None, None, torch.tensor(mask)
    )
    ours_pos, ours_delta = get_rope_index(
        ids, grid, None, mask,
        image_token_id=500, video_token_id=501, vision_start_token_id=498,
    )
    np.testing.assert_array_equal(ours_pos, hf_pos.numpy())
    np.testing.assert_array_equal(ours_delta, hf_delta.numpy())


def test_build_vision_geometry_window_padding():
    # merged grid 2x3, window side 2 -> windows of 4 merged slots (16 patches),
    # 1x2 windows with edge padding -> 2 windows = 8 merged slots
    grids = np.array([[1, 4, 6]])
    geo = build_vision_geometry(grids, window_size=56, spatial_merge_size=2, patch_size=14)
    assert geo.num_patches == 24
    assert geo.window_patches == 16
    assert geo.padded_len == 2 * 16
    assert geo.patch_valid.sum() == 24
    # every real merged token has a unique slot; pads marked -1
    assert sorted(geo.patch_src[geo.patch_valid].tolist()) == list(range(24))
    assert len(set(geo.slot_of_merged.tolist())) == 6
    assert (geo.full_segment_ids[~geo.patch_valid] == -1).all()
    # explicit bucket rounds up by whole windows
    geo2 = build_vision_geometry(
        grids, window_size=56, spatial_merge_size=2, patch_size=14, padded_len=64
    )
    assert geo2.padded_len == 64 and geo2.patch_valid.sum() == 24
