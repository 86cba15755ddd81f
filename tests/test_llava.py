"""LLaVA family: CLIP parity vs HF, Llama parity, end-to-end GP pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import GPConfig, ModelConfig, TextConfig, VisionConfig
from glimpseprune_tpu.models.llava.clip import CLIPVisionTower
from glimpseprune_tpu.models.llava.convert import convert_clip, _strip_llava_prefixes
from glimpseprune_tpu.models.llava.gp_model import (
    CLIPTowerConfig,
    Llava_GP,
    llama_text_config,
    llava_config,
)
from glimpseprune_tpu.models.llava.runner import (
    expand_to_square_and_resize,
    make_llava_runner,
    prepare_llava_inputs,
)


def tiny_clip_cfg():
    return CLIPTowerConfig(
        depth=3, hidden_size=32, num_heads=4, intermediate_size=64,
        patch_size=14, image_size=56, feature_layer=-2,
    )


def tiny_llava_config():
    text = llama_text_config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=512,
        rms_norm_eps=1e-6,
    )
    gp = GPConfig(
        selected_layers=(1,),
        reduce_layer=1,
        selected_visual_layers=(1, 0),
        attn_fuse_size=16,
        visual_cond_size=16,
        attn_fuse_num_heads=4,
        attn_fuse_global=True,
        le_layers=(0, 1, 2),
        le_length=1,
        max_remain_ratio=0.5,
    )
    cfg = llava_config(clip=tiny_clip_cfg(), text=text, gp=gp)
    import dataclasses

    return dataclasses.replace(cfg, image_token_id=500, eos_token_id=502, pad_token_id=0)


def test_clip_parity_vs_hf():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cc = tiny_clip_cfg()
    hf_cfg = CLIPVisionConfig(
        hidden_size=cc.hidden_size,
        intermediate_size=cc.intermediate_size,
        num_hidden_layers=cc.depth,
        num_attention_heads=cc.num_heads,
        image_size=cc.image_size,
        patch_size=cc.patch_size,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, cc.image_size, cc.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(
            torch.tensor(pixels.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    # llava feature_select: hidden_states[-2] without CLS
    hf_feat = hf_out.hidden_states[-2][:, 1:].numpy()

    tower = CLIPVisionTower(
        depth=cc.depth, hidden_size=cc.hidden_size, num_heads=cc.num_heads,
        intermediate_size=cc.intermediate_size, patch_size=cc.patch_size,
        image_size=cc.image_size, feature_layer=-2, tap_layers=(0,),
    )
    sd = _strip_llava_prefixes(hf.state_dict())
    params = convert_clip(sd, cc)
    feats, taps = tower.apply({"params": params}, jnp.array(pixels))
    np.testing.assert_allclose(np.asarray(feats), hf_feat, rtol=2e-4, atol=2e-4)
    assert taps[0].shape == (2, 16, cc.hidden_size)


def test_llama_text_parity_vs_hf():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    tc = llama_text_config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=256,
        rms_norm_eps=1e-6,
    )
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-6, rope_theta=10000.0, attention_bias=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    from glimpseprune_tpu.models.qwen2_5_vl.convert import (
        _strip_prefixes,
        convert_text,
    )
    from glimpseprune_tpu.models.qwen2_5_vl.language import TextDecoder
    from glimpseprune_tpu.ops.rope import mrope_cos_sin

    class FakeCfg:
        text = tc

    params = convert_text(_strip_prefixes(hf.state_dict()), FakeCfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 250, size=(2, 9))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()

    td = TextDecoder(tc)
    pos = np.broadcast_to(np.arange(9)[None, None], (3, 2, 9))
    cos, sin = mrope_cos_sin(jnp.array(pos), tc.head_dim, tc.rope_theta, tc.mrope_section)
    logits = td.apply({"params": params}, jnp.array(ids), cos, sin,
                      jnp.ones((2, 9), dtype=bool))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=3e-4, atol=3e-4)


@pytest.fixture(scope="module")
def llava_setup():
    cfg = tiny_llava_config()
    cc = tiny_clip_cfg()
    rng = np.random.default_rng(0)
    prompts = [
        [7, 8, cfg.image_token_id, 9, 10],
        [11, cfg.image_token_id, 12, 13, 14],
    ]
    images = [
        rng.integers(0, 255, (80, 100, 3), dtype=np.uint8),
        rng.integers(0, 255, (56, 56, 3), dtype=np.uint8),
    ]
    bboxes = [[[0.0, 0.0, 0.5, 0.5]], None]
    prep = prepare_llava_inputs(cfg, cc, prompts, images, normed_bboxes=bboxes,
                                seq_multiple=8)
    model = Llava_GP(cfg, clip_cfg=cc)
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
    runner = make_llava_runner(cfg, cc, variables["params"])
    return cfg, cc, runner, prompts, images


def test_llava_square_pad():
    img = np.zeros((40, 80, 3), dtype=np.uint8)
    out = expand_to_square_and_resize(img, 56)
    assert out.shape == (56, 56, 3)
    # the top band is background mean, center is black
    assert out[28, 28].sum() == 0
    assert out[2, 28].sum() > 100


def test_llava_gp_generate(llava_setup):
    cfg, cc, runner, prompts, images = llava_setup
    prep = prepare_llava_inputs(cfg, cc, prompts, images, seq_multiple=8)
    res = runner.generate(prep, max_new_tokens=5)
    assert res.sequences.shape == (2, 5)
    n = prep.n_img_tokens
    assert (res.keep_img.sum(1) <= np.floor(0.5 * n) + 1).all()
    # vanilla equivalence under all-kept
    cfg_all = cfg.replace_gp(max_remain_ratio=None, reduce_threshold=-1.0)
    runner_all = make_llava_runner(cfg_all, cc, runner.params)
    prep2 = prepare_llava_inputs(cfg_all, cc, prompts, images, seq_multiple=8)
    r1 = runner_all.generate(prep2, max_new_tokens=5, do_selection=True)
    r2 = runner_all.generate(prep2, max_new_tokens=5, do_selection=False)
    np.testing.assert_array_equal(r1.sequences, r2.sequences)


def test_llava_ref_masks(llava_setup):
    cfg, cc, runner, prompts, images = llava_setup
    bboxes = [[[0.0, 0.0, 0.5, 0.5]], [[0.5, 0.5, 1.0, 1.0]]]
    prep = prepare_llava_inputs(cfg, cc, prompts, images, normed_bboxes=bboxes,
                                seq_multiple=8)
    out = runner.glimpse(prep, use_ref_masks=True)
    keep = np.asarray(out.keep_img)
    assert (keep & ~prep.ref_token_masks).sum() == 0


def test_llava_compressors(llava_setup):
    """Baseline compressors run in the LLaVA harness (shared machinery)."""
    cfg, cc, runner, prompts, images = llava_setup
    prep = prepare_llava_inputs(cfg, cc, prompts, images, seq_multiple=8)
    for method, kw in [("divprune", {"visual_token_num": 3}),
                       ("cdpruner", {"visual_token_num": 3}),
                       ("visionzip", {"dominant_ratio": 0.3, "contextual_ratio": 0.1}),
                       ("vscan", {"visual_token_num": 4}),
                       ("pdrop", {"stages": ((1, 0.5),)})]:
        res = runner.generate_compressed(prep, method, max_new_tokens=3, **kw)
        assert res.sequences.shape == (2, 3), method
        assert (res.prune_ratio > 0).all(), method


def test_clip_text_tower_parity_vs_hf():
    """CLIPTextModelWithProjection parity: the CDPruner relevance text tower
    (reference llava_cdpruner clip_encoder.py:38-46,77-87)."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    import dataclasses

    cc = dataclasses.replace(
        tiny_clip_cfg(), with_text_tower=True, projection_dim=24,
        text_depth=2, text_hidden_size=32, text_num_heads=4,
        text_intermediate_size=64, text_vocab_size=128, text_max_positions=16,
    )
    hf_cfg = CLIPTextConfig(
        vocab_size=cc.text_vocab_size, hidden_size=cc.text_hidden_size,
        intermediate_size=cc.text_intermediate_size,
        num_hidden_layers=cc.text_depth, num_attention_heads=cc.text_num_heads,
        max_position_embeddings=cc.text_max_positions,
        projection_dim=cc.projection_dim, hidden_act="quick_gelu",
        eos_token_id=127, bos_token_id=126, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    rng = np.random.default_rng(2)
    # segments: [bos, tokens..., eot(=max id), zero padding] — EOT pooling
    # goes through argmax over ids (HF CLIP convention)
    ids = np.zeros((3, cc.text_max_positions), dtype=np.int64)
    for m in range(3):
        n = 5 + m
        ids[m, 0] = 126
        ids[m, 1 : 1 + n] = rng.integers(3, 120, n)
        ids[m, 1 + n] = 127
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids)).text_embeds.numpy()

    from glimpseprune_tpu.models.llava.clip import CLIPTextTower
    from glimpseprune_tpu.models.llava.convert import convert_clip_text

    tower = CLIPTextTower(
        depth=cc.text_depth, hidden_size=cc.text_hidden_size,
        num_heads=cc.text_num_heads, intermediate_size=cc.text_intermediate_size,
        vocab_size=cc.text_vocab_size, max_positions=cc.text_max_positions,
        projection_dim=cc.projection_dim,
    )
    params = convert_clip_text(hf.state_dict(), cc)
    ours = tower.apply({"params": params}, jnp.array(ids))
    np.testing.assert_allclose(np.asarray(ours), hf_out, rtol=3e-4, atol=3e-4)


def test_clip_visual_projection_parity_vs_hf():
    """post_layernorm + visual_projection over penultimate patch features
    (the reference applies them to feature_select output, clip_encoder.py:92-94)."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    import dataclasses

    cc = dataclasses.replace(tiny_clip_cfg(), with_text_tower=True, projection_dim=24)
    hf_cfg = CLIPVisionConfig(
        hidden_size=cc.hidden_size, intermediate_size=cc.intermediate_size,
        num_hidden_layers=cc.depth, num_attention_heads=cc.num_heads,
        image_size=cc.image_size, patch_size=cc.patch_size,
        projection_dim=cc.projection_dim, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, cc.image_size, cc.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf.vision_model(
            torch.tensor(pixels.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
        feats = out.hidden_states[-2][:, 1:]
        ref = hf.visual_projection(hf.vision_model.post_layernorm(feats)).numpy()

    sd = {("clip." + k if not k.startswith("visual_projection") else k): v
          for k, v in hf.vision_model.state_dict().items()}
    sd["visual_projection.weight"] = hf.visual_projection.weight
    params = convert_clip(sd, cc)
    tower = CLIPVisionTower(
        depth=cc.depth, hidden_size=cc.hidden_size, num_heads=cc.num_heads,
        intermediate_size=cc.intermediate_size, patch_size=cc.patch_size,
        image_size=cc.image_size, feature_layer=-2,
        with_projection=True, projection_dim=cc.projection_dim,
    )
    _, _, embeds = tower.apply({"params": params}, jnp.array(pixels),
                               emit_embeds=True)
    np.testing.assert_allclose(np.asarray(embeds), ref, rtol=3e-4, atol=3e-4)


def test_cdpruner_text_conditioned_relevance():
    """CDPruner with the reference's text-conditioned relevance end to end:
    relevance = minmax(-(mean cos(img_embed, text_embed))) drives the DPP
    (llava_cdpruner llava_arch.py:156-167)."""
    import dataclasses

    cfg = tiny_llava_config()
    cc = dataclasses.replace(
        tiny_clip_cfg(), with_text_tower=True, projection_dim=24,
        text_depth=2, text_hidden_size=32, text_num_heads=4,
        text_intermediate_size=64, text_vocab_size=128, text_max_positions=16,
    )
    rng = np.random.default_rng(0)
    prompts = [[7, 8, cfg.image_token_id, 9, 10]]
    images = [rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)]
    prep = prepare_llava_inputs(cfg, cc, prompts, images, seq_multiple=8)

    model = Llava_GP(cfg, clip_cfg=cc)
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
    params = variables["params"]
    # text tower params materialize only when the flag is on
    assert "clip_text" in params
    assert "visual_projection" in params["visual"]
    runner = make_llava_runner(cfg, cc, params)

    text_ids = np.zeros((2, cc.text_max_positions), dtype=np.int32)
    text_ids[0, :4] = [126, 30, 40, 127]
    text_ids[1, :3] = [126, 55, 127]

    res = runner.generate_compressed(
        prep, "cdpruner", max_new_tokens=3, visual_token_num=3,
        clip_text_ids=text_ids,
    )
    assert res.sequences.shape == (1, 3)
    assert res.keep_img.sum() == 3

    # the relevance term matches a numpy recomputation from the towers
    img_embeds = np.asarray(model.apply(
        {"params": params}, jnp.asarray(prep.patches), True,
        method=lambda m, px, e: m.visual(px, emit_embeds=e),
    )[2], dtype=np.float64)[0]
    txt = np.asarray(model.apply(
        {"params": params}, jnp.asarray(text_ids),
        method=lambda m, t: m.clip_text(t),
    ), dtype=np.float64)
    iN = img_embeds / np.linalg.norm(img_embeds, axis=-1, keepdims=True)
    tN = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    expected = -(iN @ tN.T).mean(-1)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(prep.patches), jnp.asarray(text_ids),
        method=model.cdpruner_relevance,
    ))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_llava_gp_train_step():
    """LLaVA-family base training recipe (reference train_llava_gp.py: same
    loc+le skeleton on Llama+CLIP): the shared train step drives Llava_GP —
    new-module grads flow, frozen base untouched, loss finite and falling."""
    import optax

    from glimpseprune_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    cfg = tiny_llava_config()
    cc = tiny_clip_cfg()
    rng = np.random.default_rng(0)
    prompts = [[7, 8, cfg.image_token_id, 9]]
    images = [rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)]
    prep = prepare_llava_inputs(
        cfg, cc, prompts, images, normed_bboxes=[[[0.1, 0.1, 0.6, 0.6]]],
        answer_ids=[[11, 12, 13]], seq_multiple=8,
    )
    model = Llava_GP(cfg, clip_cfg=cc)
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
    from glimpseprune_tpu.training.trainer import batch_from_prep

    batch = batch_from_prep(prep)
    opt = optax.adam(5e-3)
    step = jax.jit(make_train_step(cfg, model, opt))
    state, frozen = init_train_state(variables["params"], opt)
    le0 = np.asarray(state.trainable["learnable_embeddings"]).copy()
    losses = []
    for i in range(4):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.abs(np.asarray(state.trainable["learnable_embeddings"]) - le0).max() > 0
    # base stays frozen by construction (it lives in the frozen tree)
    assert "text" in frozen and "visual" in frozen
