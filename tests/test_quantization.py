"""Weight-only int8 quantization: accuracy, size, pipeline, sharding.

Replaces the reference's bitsandbytes 8/4-bit builder path
(llava/model/builder.py) — on TPU the win is fitting 7B on a 16 GB chip.
"""

import numpy as np

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner
from glimpseprune_tpu.quantization import (
    dequantize_int8,
    quantize_int8,
    quantized_bytes,
    quantized_config,
)

from test_training import build_batch, init_params


def _flat_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat}


def test_quantize_structure_and_roundtrip():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    qparams = quantize_int8(params)
    paths = _flat_paths(qparams)
    assert any(p.endswith("self_attn/q_proj/kernel_q") for p in paths)
    assert any(p.endswith("mlp/down_proj/kernel_scale") for p in paths)
    # the head quantizes too (7B bf16 head = 1.09 GB/step of decode reads);
    # embeddings and norms stay fp
    assert any("lm_head/kernel_q" in p for p in paths)
    assert any("embed_tokens/embedding" in p for p in paths)
    assert not any("embed_tokens/embedding_q" in p for p in paths)

    # int8 shrinks the targeted stacks
    assert quantized_bytes(qparams) < quantized_bytes(params)

    # idempotent
    q2 = quantize_int8(qparams)
    assert _flat_paths(q2) == paths

    # round-trip error bounded by one quantization step per channel
    deq = dequantize_int8(qparams, dtype=jnp.float32)
    w = np.asarray(params["text"]["layers"]["mlp"]["gate_proj"]["kernel"], np.float32)
    w2 = np.asarray(deq["text"]["layers"]["mlp"]["gate_proj"]["kernel"], np.float32)
    step = np.abs(w).max(axis=-2, keepdims=True) / 127.0
    assert (np.abs(w - w2) <= step * 0.51 + 1e-6).all()


def test_quantized_pipeline_close_to_fp():
    cfg = tiny_test_config()
    rng = np.random.default_rng(1)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    out_fp = GlimpsePruneRunner(cfg, params).glimpse(prep)
    out_q = GlimpsePruneRunner(quantized_config(cfg), quantize_int8(params)).glimpse(prep)

    a = np.asarray(out_fp.logits, np.float64).reshape(-1)
    b = np.asarray(out_q.logits, np.float64).reshape(-1)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99, cos
    # mask logits track closely (keep decisions on a random-init tiny model
    # flip on near-ties, so compare the scores, not the argsort)
    ma = np.asarray(out_fp.mask_logits, np.float64).reshape(-1)
    mb = np.asarray(out_q.mask_logits, np.float64).reshape(-1)
    mcos = ((ma - ma.mean()) @ (mb - mb.mean())) / (
        np.linalg.norm(ma - ma.mean()) * np.linalg.norm(mb - mb.mean()) + 1e-12
    )
    assert mcos > 0.95, mcos
    agree = (np.asarray(out_fp.keep_img) == np.asarray(out_q.keep_img)).mean()
    assert agree > 0.7, agree


def test_quantized_params_shard():
    from glimpseprune_tpu.parallel.mesh import make_mesh, shard_params

    cfg = tiny_test_config()
    rng = np.random.default_rng(2)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    qparams = quantize_int8(params)
    mesh = make_mesh(model_axis=2)
    sharded = shard_params(qparams, mesh)
    kq = sharded["text"]["layers"]["self_attn"]["q_proj"]["kernel_q"]
    assert kq.dtype == jnp.int8
    assert "model" in str(kq.sharding.spec)


def test_llava_quantized_decoder():
    """int8 quantizes the Llama stack under LLaVA too (CLIP tower untouched:
    its kernels live under visual/layers_*, outside DEFAULT_INCLUDE)."""
    from test_llava import tiny_clip_cfg, tiny_llava_config
    from glimpseprune_tpu.models.llava.gp_model import Llava_GP
    from glimpseprune_tpu.models.llava.runner import prepare_llava_inputs

    cfg, cc = tiny_llava_config(), tiny_clip_cfg()
    rng = np.random.default_rng(7)
    prompts = [[7, 8, cfg.image_token_id, 9, 10]]
    images = [rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)]
    prep = prepare_llava_inputs(cfg, cc, prompts, images, seq_multiple=8)
    model = Llava_GP(cfg, clip_cfg=cc)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index), jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start), prep.out_len,
    )["params"]
    qparams = quantize_int8(params)
    paths = _flat_paths(qparams)
    assert any(p.endswith("text/layers/mlp/down_proj/kernel_q") for p in paths)
    assert not any("visual" in p and p.endswith("kernel_q") for p in paths)

    from glimpseprune_tpu.models.llava.runner import make_llava_runner

    qcfg = quantized_config(cfg)
    qrunner = make_llava_runner(qcfg, cc, qparams)
    # CLIP tower declares no stacked quant structure; only text flips
    out = qrunner.glimpse(prep)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_qlora_int8_base_plus_inscan_lora():
    """QLoRA: int8 frozen base + fp in-scan adapters (7B GlimpsePrune+ on
    one chip). Adapters attach at kernel_q paths; zero-B == base exactly."""
    import dataclasses
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.training.lora import insert_lora, make_lora_params

    cfg = tiny_test_config()
    rng = np.random.default_rng(9)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    qparams = quantize_int8(params)
    lora = make_lora_params(qparams, rank=2)
    assert len(lora) == 7  # all decoder linears matched through kernel_q

    qlcfg = quantized_config(cfg)
    qlcfg = dataclasses.replace(
        qlcfg, text=dataclasses.replace(qlcfg.text, lora_rank=2)
    )
    model = Qwen2_5_VL_GP(qlcfg)
    base = GlimpsePruneRunner(quantized_config(cfg), qparams).glimpse(prep)
    ql = GlimpsePruneRunner(qlcfg, insert_lora(qparams, lora), model=model)
    out0 = ql.glimpse(prep)
    # B starts at zero -> adapters are inert
    np.testing.assert_allclose(
        np.asarray(out0.logits), np.asarray(base.logits), rtol=1e-5, atol=1e-5
    )
    # nonzero B changes the output
    lora2 = jax.tree_util.tree_map(lambda x: x + 0.05, lora)
    out1 = GlimpsePruneRunner(
        qlcfg, insert_lora(qparams, lora2), model=model
    ).glimpse(prep)
    assert not np.allclose(np.asarray(out1.logits), np.asarray(base.logits))


def test_int4_pipeline_close_to_fp():
    """4-bit tier (reference llava builder load_4bit): packed-nibble kernels
    + group scales run the full GP pipeline close to fp."""
    from glimpseprune_tpu.quantization import dequant_int4, quantize_int4

    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    q4 = quantize_int4(params)
    paths = _flat_paths(q4)
    assert any(p.endswith("kernel_q4") for p in paths), sorted(paths)[:5]
    # 4-bit packing halves the int8 size on targeted kernels
    assert quantized_bytes(q4) < quantized_bytes(quantize_int8(params))

    # dequant error bounded by one step of the 4-bit grid per group
    leaf = q4["text"]["layers"]["self_attn"]["q_proj"]
    w = np.asarray(params["text"]["layers"]["self_attn"]["q_proj"]["kernel"], np.float64)
    back = np.asarray(dequant_int4(leaf, jnp.float32), np.float64)
    group = (leaf["kernel_q4"].shape[-2] * 2) // leaf["kernel_scale4"].shape[-2]
    gmax = np.abs(w.reshape(w.shape[0], -1, group, w.shape[-1])).max(axis=2)
    step = np.repeat(gmax / 7.0, group, axis=1)
    assert (np.abs(back - w) <= step * 0.5 + 1e-8).all()

    out_fp = GlimpsePruneRunner(cfg, params).glimpse(prep)
    out_q4 = GlimpsePruneRunner(
        quantized_config(cfg, "int4"), q4
    ).glimpse(prep)
    a = np.asarray(out_fp.logits, np.float64).reshape(-1)
    b = np.asarray(out_q4.logits, np.float64).reshape(-1)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    # random-init tiny weights are the worst case for 4-bit (flat spectrum,
    # hidden 64): the quantization-step bound above is the exactness check,
    # this is the sanity floor
    assert cos > 0.9, cos
    # mask logits + keep decisions track the fp pipeline (serving-tier
    # quality guard, VERDICT r3 #2; same pattern as the int8 test above
    # with 4-bit-looser floors)
    ma = np.asarray(out_fp.mask_logits, np.float64).reshape(-1)
    mb = np.asarray(out_q4.mask_logits, np.float64).reshape(-1)
    mcos = ((ma - ma.mean()) @ (mb - mb.mean())) / (
        np.linalg.norm(ma - ma.mean()) * np.linalg.norm(mb - mb.mean()) + 1e-12
    )
    assert mcos > 0.9, mcos
    agree = (np.asarray(out_fp.keep_img) == np.asarray(out_q4.keep_img)).mean()
    assert agree > 0.6, agree


def test_w8a8_matmul_close_to_dequant():
    """Dynamic W8A8 (matmul_w8a8): int8 x int8 -> int32 with a rank-1
    rescale must track the weight-only dequant matmul within the activation
    quantization step (per-row amax/127 x sum over K of |w|-scale)."""
    from glimpseprune_tpu.quantization import matmul_w8a8, quantize_int8

    rng = np.random.default_rng(5)
    K, N = 64, 48
    x = jnp.asarray(rng.standard_normal((4, 10, K)), jnp.float32)
    w = {"kernel": jnp.asarray(rng.standard_normal((K, N)), jnp.float32)}
    qw = quantize_int8({"text": {"layers": {"mlp": {"gate_proj": w}}}})
    leaf = qw["text"]["layers"]["mlp"]["gate_proj"]

    w_deq = leaf["kernel_q"].astype(jnp.float32) * leaf["kernel_scale"]
    ref = np.asarray(x @ w_deq, np.float64)
    got = np.asarray(
        matmul_w8a8(x, leaf["kernel_q"], leaf["kernel_scale"], jnp.float32),
        np.float64,
    )
    # error bound: per-row activation step (amax/127) * K * mean |w|
    amax = np.abs(np.asarray(x, np.float64)).max(axis=-1, keepdims=True)
    bound = (amax / 127.0) * np.abs(np.asarray(w_deq, np.float64)).sum(axis=0) * 0.51
    assert (np.abs(got - ref) <= bound + 1e-5).all()


def test_w8a8_pipeline_close_to_fp():
    """act_quant="int8" runs the full GP pipeline (both towers + head on the
    W8A8 path) close to fp — the serving tier for the v5e int8 MXU mode."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(11)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    out_fp = GlimpsePruneRunner(cfg, params).glimpse(prep)
    a8cfg = quantized_config(cfg, "int8", act_quant="int8")
    assert a8cfg.text.act_quant == "int8" and a8cfg.vision.act_quant == "int8"
    out_a8 = GlimpsePruneRunner(a8cfg, quantize_int8(params)).glimpse(prep)

    a = np.asarray(out_fp.logits, np.float64).reshape(-1)
    b = np.asarray(out_a8.logits, np.float64).reshape(-1)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.98, cos

    # generate also runs on the a8 path (decode layers + head)
    gen = GlimpsePruneRunner(a8cfg, quantize_int8(params)).generate(
        prep, max_new_tokens=4
    )
    assert np.asarray(gen.sequences).shape[1] == 4

    # serving tier: act_quant="prefill" keeps decode on the weight-only
    # path; the full pipeline still tracks fp and generates
    pcfg = quantized_config(cfg, "int8", act_quant="prefill")
    pr = GlimpsePruneRunner(pcfg, quantize_int8(params))
    out_p = pr.glimpse(prep)
    bp = np.asarray(out_p.logits, np.float64).reshape(-1)
    cosp = (a @ bp) / (np.linalg.norm(a) * np.linalg.norm(bp) + 1e-12)
    assert cosp > 0.98, cosp
    assert np.asarray(pr.generate(prep, max_new_tokens=4).sequences).shape[1] == 4

    # attn_qk_int8 tier: plumbs through both towers (below the flash-size
    # threshold the XLA fallback stays bf16, so logits are unchanged;
    # kernel-level int8 numerics are covered in test_flash_attention)
    q8cfg = quantized_config(cfg, "int8", act_quant="prefill",
                             attn_qk_int8=True)
    assert q8cfg.text.attn_qk_int8 and q8cfg.vision.attn_qk_int8
    out_q8 = GlimpsePruneRunner(q8cfg, quantize_int8(params)).glimpse(prep)
    np.testing.assert_allclose(np.asarray(out_q8.logits),
                               np.asarray(out_p.logits), rtol=1e-5, atol=1e-5)


def test_attn_int8_tower_scoping():
    """attn_qk_int8/attn_pv_int8 accept a tower scope ("vision"/"text"/
    "both") — the serving default scopes int8 attention to the ViT, where
    the D=80->128 MXU padding makes it a win (r3 ladder), leaving the
    already-efficient D=128 LLM path bf16."""
    import pytest as _pytest

    cfg = tiny_test_config()
    vit = quantized_config(cfg, "int8", act_quant="prefill",
                           attn_qk_int8="vision", attn_pv_int8="vision")
    assert vit.vision.attn_qk_int8 and vit.vision.attn_pv_int8
    assert not vit.text.attn_qk_int8 and not vit.text.attn_pv_int8
    txt = quantized_config(cfg, "int8", act_quant="prefill",
                           attn_qk_int8="text")
    assert txt.text.attn_qk_int8 and not txt.vision.attn_qk_int8
    both = quantized_config(cfg, "int8", act_quant="prefill",
                            attn_qk_int8="both", attn_pv_int8=True)
    assert both.text.attn_pv_int8 and both.vision.attn_pv_int8
    with _pytest.raises(ValueError):
        quantized_config(cfg, "int8", act_quant="prefill", attn_qk_int8="gpu")
    with _pytest.raises(AssertionError):
        # pv on a tower where qk is off
        quantized_config(cfg, "int8", act_quant="prefill",
                         attn_qk_int8="text", attn_pv_int8="vision")


def test_int8_kv_cache_attention_exact_and_pipeline():
    """int8 KV-cache tier (ops/kv_cache.py): the per-token-head scale
    factors out of both decode matmuls, so quantized-cache attention must
    equal attention over the explicitly dequantized cache; and the full
    generate pipeline runs with tokens matching the bf16-cache run on the
    seeded tiny model."""
    import dataclasses

    from glimpseprune_tpu.ops.attention import decode_attention
    from glimpseprune_tpu.ops.kv_cache import (
        alloc_cache,
        cache_layer,
        cache_set_prefix,
        quantize_kv,
    )

    rng = np.random.default_rng(0)
    B, T, Hkv, D, Hq = 2, 16, 2, 8, 4
    kv = jnp.asarray(rng.standard_normal((1, B, T, Hkv, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    valid = jnp.asarray(rng.random((B, T)) < 0.8)

    cache = cache_set_prefix(alloc_cache((1, B, T, Hkv, D), jnp.float32, "int8"), kv)
    layer = cache_layer(cache, jnp.int32(0))
    # explicit dequant oracle
    deq = (layer["q"].astype(jnp.float32) * layer["s"][..., None])
    out_q = decode_attention(q, layer, layer, valid)
    out_d = decode_attention(q, deq, deq, valid)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d), rtol=2e-5, atol=2e-5)

    # quantization error itself is bounded by one step per channel
    qq, ss = quantize_kv(kv)
    back = qq.astype(jnp.float32) * ss[..., None]
    assert float(jnp.abs(back - kv).max()) <= float(ss.max()) * 0.51 + 1e-6

    # pipeline: seeded tiny model, greedy tokens match across cache tiers
    cfg = tiny_test_config()
    rngb = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rngb, with_labels=False)
    _, params = init_params(cfg, prep)
    out_bf = GlimpsePruneRunner(cfg, params).generate(prep, max_new_tokens=6)

    cfg_q = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_cache_quant="int8")
    )
    out_q8 = GlimpsePruneRunner(cfg_q, params).generate(prep, max_new_tokens=6)
    # a random-init tiny model flips greedy picks on near-ties as int8 cache
    # noise accumulates; early steps must agree (few perturbed reads)
    np.testing.assert_array_equal(
        np.asarray(out_bf.sequences)[:, :3], np.asarray(out_q8.sequences)[:, :3]
    )
