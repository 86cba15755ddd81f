"""Numerical parity vs HF Qwen2.5-VL (CPU torch, tiny random config).

SURVEY.md §7 build step 2: the vanilla forward must match HF eager before any
GP machinery lands on top.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.convert import (
    convert_hf_state_dict,
    hf_config_to_model_config,
)
from glimpseprune_tpu.models.qwen2_5_vl.language import TextDecoder
from glimpseprune_tpu.models.qwen2_5_vl.vision import VisionTransformer
from glimpseprune_tpu.ops.rope import mrope_cos_sin
from glimpseprune_tpu.preprocessing import build_vision_geometry, get_rope_index


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-6,
        rope_theta=1e6,
        vision_config=dict(
            depth=4, hidden_size=32, num_heads=4, intermediate_size=64,
            patch_size=14, window_size=56, spatial_merge_size=2,
            temporal_patch_size=2, fullatt_block_indexes=[3], out_hidden_size=64,
        ),
        image_token_id=500,
        video_token_id=501,
        vision_start_token_id=498,
        vision_end_token_id=499,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        tie_word_embeddings=False,
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return model, cfg


def test_vision_parity(hf_model):
    import torch

    model, hf_cfg = hf_model
    cfg = hf_config_to_model_config(hf_cfg)
    params = convert_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    grids = np.array([[1, 6, 8], [1, 4, 4]])
    n_patches = int((grids[:, 0] * grids[:, 1] * grids[:, 2]).sum())
    in_dim = 3 * 2 * 14 * 14
    patches = rng.normal(size=(n_patches, in_dim)).astype(np.float32)

    with torch.no_grad():
        hf_out = model.model.visual(
            torch.tensor(patches), grid_thw=torch.tensor(grids)
        ).numpy()

    geo = build_vision_geometry(grids, window_size=56, spatial_merge_size=2, patch_size=14)
    mu = 4
    patches_win = np.zeros((geo.padded_len, patches.shape[1]), dtype=patches.dtype)
    patches_win[geo.patch_valid] = patches[geo.patch_src[geo.patch_valid]]

    vit = VisionTransformer(cfg.vision, tap_layers=(1, 3))
    merged_slots, taps = vit.apply(
        {"params": params["visual"]},
        jnp.array(patches_win),
        jnp.array(geo.pos_ids),
        jnp.array(geo.full_segment_ids),
        jnp.array(geo.patch_valid),
    )
    # gather real merged tokens in natural order for comparison
    merged_nat = np.asarray(merged_slots)[geo.slot_of_merged]
    np.testing.assert_allclose(merged_nat, hf_out, rtol=2e-4, atol=2e-4)
    assert taps[0].shape == (geo.padded_len // mu, 32)


def test_text_parity_full_prefill(hf_model):
    import torch

    model, hf_cfg = hf_model
    cfg = hf_config_to_model_config(hf_cfg)
    params = convert_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    B, L = 2, 12
    ids = rng.integers(5, 400, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[0, :3] = 0  # left padding row 0
    pos, _ = get_rope_index(ids, None, None, mask)

    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos),
        ).logits.numpy()

    td = TextDecoder(cfg.text)
    cos, sin = mrope_cos_sin(jnp.array(pos), cfg.text.head_dim, cfg.text.rope_theta, cfg.text.mrope_section)
    logits = td.apply(
        {"params": params["text"]},
        jnp.array(ids), cos, sin, jnp.array(mask, dtype=bool),
    )
    ours = np.asarray(logits)
    # compare only valid positions (padded positions see different masks)
    np.testing.assert_allclose(
        ours[mask.astype(bool)], hf_logits[mask.astype(bool)], rtol=2e-4, atol=2e-4
    )


def test_decode_matches_prefill(hf_model):
    """Greedy decode over the KV cache reproduces full-prefill logits."""
    model, hf_cfg = hf_model
    cfg = hf_config_to_model_config(hf_cfg)
    params = convert_hf_state_dict(model.state_dict(), cfg)
    td = TextDecoder(cfg.text)

    rng = np.random.default_rng(2)
    B, L = 2, 10
    ids = rng.integers(5, 400, size=(B, L))
    mask = np.ones((B, L), dtype=bool)
    pos, _ = get_rope_index(ids, None, None, mask.astype(np.int64))
    cos, sin = mrope_cos_sin(jnp.array(pos), cfg.text.head_dim, cfg.text.rope_theta, cfg.text.mrope_section)

    # full prefill logits
    full_logits = td.apply({"params": params["text"]}, jnp.array(ids), cos, sin, jnp.array(mask))

    # prefill on first L-1 tokens, then decode token L-1
    pos_pre = pos[:, :, : L - 1]
    cos_p, sin_p = mrope_cos_sin(jnp.array(pos_pre), cfg.text.head_dim, cfg.text.rope_theta, cfg.text.mrope_section)

    def prefill(module, ids_, cos_, sin_, valid_):
        x = module.embed(ids_)
        x, kv, _ = module.run_layers(x, cos_, sin_, valid_)
        return kv

    k, v = td.apply({"params": params["text"]}, jnp.array(ids[:, : L - 1]), cos_p, sin_p,
                    jnp.array(mask[:, : L - 1]), method=prefill)

    # extend cache buffers by 1 slot
    T = L
    k_cache = jnp.zeros((cfg.text.num_hidden_layers, B, T, cfg.text.num_key_value_heads, cfg.text.head_dim))
    v_cache = jnp.zeros_like(k_cache)
    k_cache = k_cache.at[:, :, : L - 1].set(k)
    v_cache = v_cache.at[:, :, : L - 1].set(v)

    pos_last = pos[:, :, L - 1 :]
    cos_l, sin_l = mrope_cos_sin(jnp.array(pos_last), cfg.text.head_dim, cfg.text.rope_theta, cfg.text.mrope_section)
    kv_valid = jnp.ones((B, T), dtype=bool)
    logits, _, _ = td.apply(
        {"params": params["text"]},
        jnp.array(ids[:, L - 1 :]), cos_l, sin_l,
        k_cache, v_cache, kv_valid, jnp.int32(L - 1),
        method=td.decode_step,
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, 0]), np.asarray(full_logits[:, -1]), rtol=2e-4, atol=2e-4
    )
