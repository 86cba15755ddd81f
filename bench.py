"""Benchmark: pruned vs unpruned generate throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Default = the SERVING protocol (run_serving): Qwen2.5-VL-7B (int8 weights +
int8 KV cache on one 16 GB v5e chip), the reference's large-image regime
(~16k visual tokens, max_pixels cap train_qwen_gp.py:1645-1648), 92%
pruning, 1024-token generations (reference max_new_tokens,
viscot_eval/infer_cot.py:116-119). Each side runs at its max feasible
batch — KV-cache residency is what caps batch, and the 12x-smaller
compacted cache is GP's production win:

  value       = pruned generated tokens/sec/chip (B=28)
  vs_baseline = vs the SAME stack unpruned at ITS max batch (B=7)

BENCH_MODE=e2e selects the single-request protocol instead (run():
end-to-end generate wall-clock, prefill + decode sub-ratios in detail —
prefill-only ratio is Amdahl-capped at ~1.13x by reference parity, see
docs/ROUND2.md).

Weights are random-init (no checkpoints in this environment); under a
quantized tier the int8 kernels init to their placeholder zeros — the
arithmetic is dense either way, so wall-clock does not depend on weight
values. Runs that need a LEARNABLE base (tools/convergence_run.py --quant)
init real weights on the host and quantize them instead.

Env knobs: BENCH_SCALE=7b|3b|1b, BENCH_QUANT=int8|int4|'',
BENCH_ACT_QUANT=int8|prefill|none (dynamic W8A8 on the int8 kernels — the v5e
native int8 MXU serving tier, applied to BOTH sides),
BENCH_QK_INT8=1|vit|text|both (int8-QK flash attention riding the act_quant
tier; "vit"/"text" scope it to one tower — int8 attention wins in the ViT,
loses in the LLM, r3 ladder),
BENCH_PV_INT8=1|vit|text|both (extend to the PV dot; implies BENCH_QK_INT8
at the same scope),
BENCH_KV_QUANT=int8|none, BENCH_MAX_PIXELS=N (0 -> ~1M px / 1.3k tokens),
BENCH_DECODE=N steps, BENCH_BATCH, BENCH_USE_REF, BENCH_REDUCE_LAYER,
BENCH_SERVE_ROWS_P/_U, BENCH_SERVE_CHUNK, BENCH_REAL_WEIGHTS=1 (host-init
real random weights then quantize, instead of the zero-placeholder int8
init; realistic logit distributions for the decode sampler).
"""

import json
import os
import sys
import time

import numpy as np


def build_cfg(scale: str, reduce_layer_override=None):
    from glimpseprune_tpu.config import GPConfig, ModelConfig, TextConfig, VisionConfig

    # reference 3B GP recipe: reduce/select at layer 23 of 36,
    # AttnFuserV1(256, cond 512, 4 heads), use_attention_logits=true
    # (reference train_configs/qwen2_5_3b_gp/qwen2_5_3b_gp.yaml)
    gp = GPConfig(
        selected_layers=(23,),
        reduce_layer=23,
        use_attention_logits=True,
        attn_fuse_type="AttnFuserV1",
        attn_fuse_size=256,
        visual_cond_size=512,
        attn_fuse_num_heads=4,
        selected_visual_layers=(31, 23, 15, 7),
        le_layers=tuple(range(36)),
        le_length=1,
        max_remain_ratio=0.08,  # 92% pruning
        min_remain_num=1,
        ori_attn_supervision=False,
    )
    if scale == "7b":
        # reference qwen2_5_7b_gp.yaml recipe: reduce/select at 18 of 28
        text = TextConfig(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        )
        vision = VisionConfig(out_hidden_size=3584)
        gp = GPConfig(
            **{**gp.__dict__, "selected_layers": (18,), "reduce_layer": 18,
               "le_layers": tuple(range(28))}
        )
    elif scale == "3b":
        text = TextConfig(
            vocab_size=151936, hidden_size=2048, intermediate_size=11008,
            num_hidden_layers=36, num_attention_heads=16, num_key_value_heads=2,
        )
        vision = VisionConfig(out_hidden_size=2048)
    elif scale == "1b":
        text = TextConfig(
            vocab_size=151936, hidden_size=1536, intermediate_size=8192,
            num_hidden_layers=24, num_attention_heads=12, num_key_value_heads=2,
            mrope_section=(16, 24, 24), hidden_act="silu",
        )
        vision = VisionConfig(out_hidden_size=1536)
        gp = GPConfig(
            **{**gp.__dict__, "selected_layers": (15,), "reduce_layer": 15,
               "le_layers": tuple(range(24))}
        )
    else:
        raise ValueError(scale)
    if reduce_layer_override is not None:
        import dataclasses

        gp = dataclasses.replace(
            gp,
            reduce_layer=reduce_layer_override,
            selected_layers=(min(gp.selected_layers[0], reduce_layer_override),),
        )
    return ModelConfig(vision=vision, text=text, gp=gp)


def _quant_from_env(cfg):
    """Apply the BENCH_QUANT / BENCH_ACT_QUANT / BENCH_KV_QUANT tiers to a
    ModelConfig. All tiers apply to BOTH bench sides (protocol honesty:
    every optimization hits pruned and unpruned alike)."""
    import dataclasses

    quant = os.environ.get("BENCH_QUANT", "")
    if quant not in ("", "int8", "int4"):
        raise ValueError(f"BENCH_QUANT must be ''/'int8'/'int4', got {quant!r}")
    if quant:
        # weight-only int8/int4 (quantization.py): 7B fits one 16GB v5e chip
        from glimpseprune_tpu.quantization import quantized_config

        act = os.environ.get("BENCH_ACT_QUANT", "none") or "none"

        def _attn8(name):
            # "1"/"both" = both towers; "vit"/"vision"/"text" scope the tier
            # to one tower (r3 ladder: int8 attention wins in the ViT, loses
            # in the LLM — see quantization.quantized_config)
            v = os.environ.get(name, "0").strip().lower()
            if v in ("", "0", "none", "false"):
                return False
            if v in ("1", "true", "both"):
                return True
            if v in ("vit", "vision"):
                return "vision"
            if v == "text":
                return "text"
            raise ValueError(f"{name} must be 0/1/vit/text/both, got {v!r}")

        pv8 = _attn8("BENCH_PV_INT8")
        qk8 = _attn8("BENCH_QK_INT8") or pv8
        cfg = quantized_config(cfg, quant, act_quant=act, attn_qk_int8=qk8,
                               attn_pv_int8=pv8)
    kv_quant = os.environ.get("BENCH_KV_QUANT", "int8")
    if kv_quant and kv_quant != "none":
        # int8 decode KV cache (ops/kv_cache.py): the serving-capacity tier
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, kv_cache_quant=kv_quant)
        )
    return cfg, quant


def _init_args(prep):
    import jax
    import jax.numpy as jnp

    return (
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index), jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start),
    )


def _make_params(cfg, quant, model, prep):
    """Build the bench weights.

    Default: jitted on-device init — under int8/int4 declarations the fp
    stacks are DCE'd and the quantized kernels init to their zero
    placeholders (arithmetic is dense either way, so wall-clock doesn't
    depend on the values).

    BENCH_REAL_WEIGHTS=1 (VERDICT r2 #8): init REAL random weights on the
    host CPU on a small shape (param shapes don't depend on inputs) and
    ship the tree to the device — the serving run then sees a realistic
    logit distribution, so sampling/eos behavior matches real serving.
    The quantized tiers are drawn directly in their int8/int4
    representation (utils/fastinit.py, ~90 s at 7B) — the old
    fp32-generate -> quantize chain cost ~40 min of single-core host work
    (measured r4) and produced the same discretized-normal statistics."""
    import jax
    import jax.numpy as jnp

    if not (quant and os.environ.get("BENCH_REAL_WEIGHTS")):
        init_jit = jax.jit(model.init, static_argnums=(16,))
        return init_jit(*_init_args(prep), prep.out_len)["params"]

    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs
    from glimpseprune_tpu.utils.fastinit import (
        device_random_params,
        fast_random_params,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    prompt = ([5, 6] + [cfg.vision_start_token_id, cfg.image_token_id,
                        cfg.vision_end_token_id] + [7, 8])
    sprep = prepare_inputs(cfg, [prompt], [img])
    dev = jax.devices()[0]
    if dev.platform != "cpu":
        # accelerator: draw on-device (seconds; compact allocation — a
        # leaf-by-leaf device_put fragments HBM enough to OOM the B=48
        # serving frontier that the jitted-init layout fits)
        return device_random_params(model, _init_args(sprep), sprep.out_len)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        qparams = fast_random_params(model, _init_args(sprep), sprep.out_len)
    params = jax.device_put(qparams, dev)
    del qparams
    return params


def run(scale: str):
    import os as _os
    reduce_override = _os.environ.get("BENCH_REDUCE_LAYER")
    reduce_override = int(reduce_override) if reduce_override else None
    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import (
        GlimpsePruneRunner,
        prepare_inputs,
    )

    cfg, quant = _quant_from_env(build_cfg(scale, reduce_override))
    rng = np.random.default_rng(0)

    # ~1M-pixel image -> smart_resize caps at 1280 merged visual tokens
    img = rng.integers(0, 255, (1036, 1036, 3), dtype=np.uint8)
    prompt = (
        [int(x) for x in rng.integers(5, 100000, 24)]
        + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        + [int(x) for x in rng.integers(5, 100000, 24)]
    )
    use_ref = bool(_os.environ.get("BENCH_USE_REF"))  # ablation: skip fuser/harvest
    # default = the reference's large-image cap (~16k visual tokens);
    # BENCH_MAX_PIXELS=0 selects the round-1 ~1.3k-token point
    max_px_env = _os.environ.get("BENCH_MAX_PIXELS", "12845056")
    max_px = int(max_px_env) or None
    if max_px:
        # larger-image operating point: regenerate a big enough source image
        side = int((max_px * 1.3) ** 0.5)
        img = rng.integers(0, 255, (side, side, 3), dtype=np.uint8)
    batch = int(_os.environ.get("BENCH_BATCH", "1"))
    prep = prepare_inputs(
        cfg, [prompt] * batch, [img] * batch,
        normed_bboxes=[[[0.2, 0.2, 0.5, 0.5]]] * batch if use_ref else None,
        max_pixels=max_px,
    )

    model = Qwen2_5_VL_GP(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    # jitted init: with int8 declarations the fp stack values are DCE'd, so
    # only the final (quantized) tree ever materializes on device
    params = _make_params(cfg, quant, model, prep)

    runner = GlimpsePruneRunner(cfg, params, dtype=jnp.bfloat16)
    dev_inputs = runner._device_inputs(prep, use_ref_masks=use_ref)

    # NOTE measurement protocol for the axon TPU tunnel:
    #  - block_until_ready does NOT wait for execution; only a host read does
    #  - identical (executable, args) calls are served from a cache
    # so every timed call perturbs its input in-program and syncs by reading
    # one result scalar back to the host; measured tunnel RTT is subtracted.
    import functools

    @functools.partial(jax.jit, static_argnames=("out_len",))
    def pruned_fn(params, inputs, i, out_len):
        inputs = dict(inputs)
        inputs["patches"] = inputs["patches"] + i * 1e-6
        out = runner._prefill_impl(params, inputs, out_len, use_ref)
        return (out.logits.astype(jnp.float32)[0, -1, :8].sum()
                + out.kv_k.astype(jnp.float32).sum() * 1e-12)

    le_len = cfg.gp.le_length
    vanilla_static = {
        "input_ids": dev_inputs["input_ids"][:, :-le_len],
        "valid": dev_inputs["valid"][:, :-le_len],
        "position_ids": dev_inputs["position_ids"][:, :, :-le_len],
    }

    @jax.jit
    def unpruned_fn(params, inputs, vanilla, i):
        merged, _ = runner.model.apply(
            params, inputs["patches"] + i * 1e-6, inputs["vis_pos_ids"],
            inputs["full_seg"], inputs["vis_valid"],
            method=runner.model.vision_encode,
        )
        # logits_last_only: a generate() baseline only needs the final
        # position's logits, same as the pruned path's [B,1,V] resume output
        logits, kv_k, kv_v = runner.model.apply(
            params, vanilla["input_ids"], vanilla["valid"], vanilla["position_ids"],
            merged, inputs["packed_idx"], inputs["img_slots"], inputs["img_valid"],
            True,
            method=runner.model.vanilla_prefill,
        )
        return (logits.astype(jnp.float32)[0, -1, :8].sum()
                + kv_k.astype(jnp.float32).sum() * 1e-12)

    trivial = jax.jit(lambda x: x + 1)
    float(trivial(jnp.zeros(8))[0])
    rtts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(trivial(jnp.full((8,), float(i)))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    def timeit(fn, iters=4):
        float(fn(jnp.float32(0.5)))  # compile + warm
        times = []
        for i in range(1, iters + 1):
            t0 = time.perf_counter()
            float(fn(jnp.float32(i)))
            times.append(time.perf_counter() - t0)
        return max(min(times) - rtt, 1e-6)

    t_pruned = timeit(lambda i: pruned_fn({"params": params}, dev_inputs, i,
                                          out_len=prep.out_len))
    t_unpruned = timeit(lambda i: unpruned_fn({"params": params}, dev_inputs,
                                              vanilla_static, i))

    @jax.jit
    def vision_fn(params, inputs, i):
        # the ViT share of every prefill (identical on both sides)
        merged, _ = runner.model.apply(
            params, inputs["patches"] + i * 1e-6, inputs["vis_pos_ids"],
            inputs["full_seg"], inputs["vis_valid"],
            method=runner.model.vision_encode,
        )
        return merged.astype(jnp.float32)[0, :8].sum()

    t_vision = timeit(lambda i: vision_fn({"params": params}, dev_inputs, i))

    decode_detail = {}
    if int(os.environ.get("BENCH_DECODE", "128")):
        # decode n_dec tokens over the compacted vs FULL KV cache (one
        # chunked lax.scan each; eos=-1 so no early exit). The pruned-vs-
        # unpruned decode delta is what the ~92% smaller KV buys per step
        # (reference protocol: llm_forward decode timing, warppers.py:190-300)
        n_dec = int(os.environ.get("BENCH_DECODE", "128"))
        out = runner._prefill({"params": params}, dev_inputs,
                              out_len=prep.out_len, use_ref_masks=use_ref)

        def dec_pruned(i):
            seqs, _ = runner._decode_loop(
                out.logits + i * 1e-6, out.valid, out.position_ids,
                out.kv_k, out.kv_v, n_dec, -1, chunk_size=n_dec,
                rng=jax.random.PRNGKey(i),
            )
            return seqs.sum()

        # unpruned baseline: decode over the full-length vanilla KV
        merged_u = runner._vision(
            {"params": params}, dev_inputs["patches"], dev_inputs["vis_pos_ids"],
            dev_inputs["full_seg"], dev_inputs["vis_valid"],
        )[0]
        u_logits, u_kv_k, u_kv_v = jax.jit(
            lambda p, *a: runner.model.apply(
                p, *a, True, method=runner.model.vanilla_prefill)
        )(
            {"params": params}, vanilla_static["input_ids"],
            vanilla_static["valid"], vanilla_static["position_ids"], merged_u,
            dev_inputs["packed_idx"], dev_inputs["img_slots"],
            dev_inputs["img_valid"],
        )

        def dec_unpruned(i):
            seqs, _ = runner._decode_loop(
                u_logits + i * 1e-6, vanilla_static["valid"],
                vanilla_static["position_ids"], u_kv_k, u_kv_v, n_dec, -1,
                chunk_size=n_dec, rng=jax.random.PRNGKey(i),
            )
            return seqs.sum()

        def time_decode(fn):
            t0 = time.perf_counter()
            fn(0)  # compile + warm
            compile_s = time.perf_counter() - t0
            ts = []
            for i in range(1, 4):
                t0 = time.perf_counter()
                fn(i)
                ts.append(time.perf_counter() - t0)
            return max(min(ts) - rtt, 1e-6), compile_s

        t_dec_p, compile_p = time_decode(dec_pruned)
        t_dec_u, compile_u = time_decode(dec_unpruned)
        # end-to-end generate = prefill + n_dec decode steps (reference
        # do_generate wall-clock protocol, viscot_eval/infer_cot.py:315-347)
        e2e_p = t_pruned + t_dec_p
        e2e_u = t_unpruned + t_dec_u
        decode_detail = {
            "n_decode": n_dec,
            "pruned_decode_tok_s": round(batch * n_dec / t_dec_p, 1),
            "unpruned_decode_tok_s": round(batch * n_dec / t_dec_u, 1),
            "decode_ratio": round(t_dec_u / t_dec_p, 3),
            "e2e_generate_ms": round(e2e_p * 1e3, 1),
            "e2e_generate_ms_unpruned": round(e2e_u * 1e3, 1),
            "e2e_ratio": round(e2e_u / e2e_p, 3),
            "decode_compile_s": round(compile_p + compile_u, 1),
        }

    n_tokens = int(prep.valid.sum())  # real prompt tokens (text + image + le)
    detail = {
        "prefill_pruned_ms": round(t_pruned * 1e3, 2),
        "prefill_unpruned_ms": round(t_unpruned * 1e3, 2),
        "vision_ms": round(t_vision * 1e3, 2),
        "prefill_ratio": round(t_unpruned / t_pruned, 3),
        "n_prompt_tokens": n_tokens,
        "n_image_tokens": int(prep.n_img_tokens[0]),
        "retention": cfg.gp.max_remain_ratio,
        "batch": batch,
        "act_quant": getattr(cfg.text, "act_quant", "none"),
        "weights": ("real-random-quantized"
                    if quant and os.environ.get("BENCH_REAL_WEIGHTS")
                    else "placeholder-zero" if quant else "real-random"),
        "device": str(jax.devices()[0]),
        **decode_detail,
    }
    suffix = (f"_{scale}" + (f"_{quant}" if quant else "")
              + ("_w8a8" if getattr(cfg.text, "act_quant", "none") != "none" else ""))
    if decode_detail:
        # headline = end-to-end generate (reference do_generate wall-clock)
        n_dec = decode_detail["n_decode"]
        e2e_s = decode_detail["e2e_generate_ms"] / 1e3
        result = {
            "metric": f"gp_e2e_generate_tokens_per_sec_chip{suffix}",
            "value": round((n_tokens + batch * n_dec) / e2e_s, 1),
            "unit": "tokens/s",
            "vs_baseline": decode_detail["e2e_ratio"],
            "detail": detail,
        }
    else:
        result = {
            "metric": f"gp_pruned_prefill_tokens_per_sec_chip{suffix}",
            "value": round(n_tokens / t_pruned, 1),
            "unit": "tokens/s",
            "vs_baseline": round(t_unpruned / t_pruned, 3),
            "detail": detail,
        }
    return result


def _serving_setup(scale: str):
    """Shared serving-bench setup: config + tiers from env, large-image
    inputs, params (placeholder or BENCH_REAL_WEIGHTS), runner, and the
    jitted B=1 prefill executables for both sides."""
    import functools
    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import (
        GlimpsePruneRunner,
        prepare_inputs,
    )

    cfg, quant = _quant_from_env(build_cfg(scale))
    rng = np.random.default_rng(0)
    max_px = int(os.environ.get("BENCH_MAX_PIXELS", "12845056")) or 1048576
    side = int((max_px * 1.3) ** 0.5)
    img = rng.integers(0, 255, (side, side, 3), dtype=np.uint8)
    prompt = (
        [int(x) for x in rng.integers(5, 100000, 24)]
        + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        + [int(x) for x in rng.integers(5, 100000, 24)]
    )
    # defaults = the measured feasibility frontier on one 16 GB v5e chip
    # (int8 weights + int8 KV): unpruned B=8 OOMs (re-probed r4 after the
    # in-place pruned assembly landed); pruned B=48 serves (B=56 OOMs) and
    # reads within ~10% of the protocol's prefill-bound asymptote
    # (docs/ROUND4.md §7)
    chunk_b = int(os.environ.get("BENCH_SERVE_CHUNK", "1"))
    rows_p = int(os.environ.get("BENCH_SERVE_ROWS_P", "48"))
    rows_u = int(os.environ.get("BENCH_SERVE_ROWS_U", "7"))
    n_dec = int(os.environ.get("BENCH_DECODE", "1024"))
    prep = prepare_inputs(cfg, [prompt] * chunk_b, [img] * chunk_b,
                          max_pixels=max_px)

    model = Qwen2_5_VL_GP(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = _make_params(cfg, quant, model, prep)
    runner = GlimpsePruneRunner(cfg, params, dtype=jnp.bfloat16)
    dev_inputs = runner._device_inputs(prep, use_ref_masks=False)

    @functools.partial(jax.jit, static_argnames=("out_len",))
    def pruned_prefill(params, inputs, i, out_len):
        inputs = dict(inputs)
        inputs["patches"] = inputs["patches"] + i * 1e-6
        return runner._prefill_impl(params, inputs, out_len, False)

    le_len = cfg.gp.le_length
    vanilla_static = {
        "input_ids": dev_inputs["input_ids"][:, :-le_len],
        "valid": dev_inputs["valid"][:, :-le_len],
        "position_ids": dev_inputs["position_ids"][:, :, :-le_len],
    }

    @jax.jit
    def unpruned_prefill(params, inputs, vanilla, i):
        merged, _ = runner.model.apply(
            params, inputs["patches"] + i * 1e-6, inputs["vis_pos_ids"],
            inputs["full_seg"], inputs["vis_valid"],
            method=runner.model.vision_encode,
        )
        return runner.model.apply(
            params, vanilla["input_ids"], vanilla["valid"],
            vanilla["position_ids"], merged, inputs["packed_idx"],
            inputs["img_slots"], inputs["img_valid"], True,
            method=runner.model.vanilla_prefill,
        )

    return {
        "cfg": cfg, "quant": quant, "prep": prep, "params": params,
        "runner": runner, "dev_inputs": dev_inputs,
        "vanilla_static": vanilla_static, "pruned_prefill": pruned_prefill,
        "unpruned_prefill": unpruned_prefill, "chunk_b": chunk_b,
        "rows_p": rows_p, "rows_u": rows_u, "n_dec": n_dec,
    }


def run_serving(scale: str):
    """Max-feasible-batch serving comparison at the large-image point.

    The production win of 92% KV pruning on a 16 GB chip: an unpruned 16.4k-
    token context costs 0.94 GB of KV per row (7B), capping the feasible
    decode batch at ~4 beside ~7 GB of int8 weights; the compacted cache is
    0.08 GB/row, so 16+ rows fit. Protocol (reference do_generate,
    max_new_tokens=1024, infer_cot.py:116-119), continuous-batching shape:
    BOTH sides prefill in chunks of B=1 (the prefill-activation cap at 16k
    tokens/row beside the weights), then decode ONE aggregated batch at
    each side's KV-residency-capped decode batch:
      pruned   — 16 prefill chunks -> concat compacted KV -> decode B=16
      unpruned — 4 prefill chunks -> write full KV into a preallocated
                 decode cache (no concat spike) -> decode B=4
    value = pruned generated tokens/s/chip; vs_baseline = ratio of
    generated-token throughput (each side at its own max batch).
    """
    import os as _os
    import functools
    import jax
    import jax.numpy as jnp

    s = _serving_setup(scale)
    cfg, quant, prep, params, runner = s["cfg"], s["quant"], s["prep"], s["params"], s["runner"]
    dev_inputs, vanilla_static = s["dev_inputs"], s["vanilla_static"]
    pruned_prefill, unpruned_prefill = s["pruned_prefill"], s["unpruned_prefill"]
    chunk_b, rows_p, rows_u, n_dec = s["chunk_b"], s["rows_p"], s["rows_u"], s["n_dec"]

    import time as _t

    n_chunks_p = rows_p // chunk_b
    n_chunks_u = rows_u // chunk_b

    def run_pruned(i0):
        # compacted chunks are ~0.09 GB each at 16k->8%, but at the B=56+
        # frontier a concat of all chunks transiently DOUBLES the multi-GB
        # decode cache — assemble in place like the unpruned side (fill a
        # preallocated cache per chunk + prealloc_t decode)
        t0 = _t.perf_counter()
        T_p = int(prep.out_len) + n_dec
        shape_p = (L, rows_p, T_p, Hkv, D)
        kc = alloc_cache(shape_p, jnp.bfloat16, cache_tier)
        vc = alloc_cache(shape_p, jnp.bfloat16, cache_tier)
        logits_parts, valid_parts, pos_parts = [], [], []
        for i in range(n_chunks_p):
            o = pruned_prefill({"params": params}, dev_inputs,
                               jnp.float32(i0 + i), out_len=prep.out_len)
            kc, vc = fill(kc, vc, o.kv_k, o.kv_v, jnp.int32(i * chunk_b))
            logits_parts.append(o.logits)
            valid_parts.append(o.valid)
            pos_parts.append(o.position_ids)
            del o
        logits = jnp.concatenate(logits_parts, axis=0)
        valid = jnp.concatenate(valid_parts, axis=0)
        pos = jnp.concatenate(pos_parts, axis=1)
        seqs, _ = runner._decode_loop(
            logits, valid, pos, kc, vc, n_dec, -1, chunk_size=n_dec,
            rng=jax.random.PRNGKey(i0), prealloc_t=T_p,
        )
        n = int(np.asarray(seqs).shape[0] * np.asarray(seqs).shape[1])
        return _t.perf_counter() - t0, n

    # unpruned full-context KV is ~0.94 GB/row (bf16): assemble the decode
    # cache in place (concat would transiently double it and OOM beside the
    # weights); the cache tier (BENCH_KV_QUANT) quantizes at fill
    from glimpseprune_tpu.ops.kv_cache import alloc_cache, cache_fill_rows

    L = cfg.text.num_hidden_layers
    Hkv, D = cfg.text.num_key_value_heads, cfg.text.head_dim
    S_u = int(vanilla_static["valid"].shape[1])
    T_u = S_u + n_dec
    cache_tier = getattr(cfg.text, "kv_cache_quant", "none")
    cache_tier = "" if cache_tier == "none" else cache_tier

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(kc, vc, ck, cv, b0):
        return (cache_fill_rows(kc, ck, b0), cache_fill_rows(vc, cv, b0))

    def run_unpruned(i0):
        t0 = _t.perf_counter()
        shape_u = (L, rows_u, T_u, Hkv, D)
        kc = alloc_cache(shape_u, jnp.bfloat16, cache_tier)
        vc = alloc_cache(shape_u, jnp.bfloat16, cache_tier)
        logits_parts = []
        for i in range(n_chunks_u):
            u_logits, u_kv_k, u_kv_v = unpruned_prefill(
                {"params": params}, dev_inputs, vanilla_static,
                jnp.float32(i0 + i))
            kc, vc = fill(kc, vc, u_kv_k, u_kv_v, jnp.int32(i * chunk_b))
            del u_kv_k, u_kv_v
            logits_parts.append(u_logits)
        logits = jnp.concatenate(logits_parts, axis=0)
        valid = jnp.concatenate([vanilla_static["valid"]] * n_chunks_u, axis=0)
        pos = jnp.concatenate(
            [vanilla_static["position_ids"]] * n_chunks_u, axis=1)
        seqs, _ = runner._decode_loop(
            logits, valid, pos, kc, vc, n_dec, -1, chunk_size=n_dec,
            rng=jax.random.PRNGKey(i0), prealloc_t=T_u,
        )
        n = int(np.asarray(seqs).shape[0] * np.asarray(seqs).shape[1])
        return _t.perf_counter() - t0, n

    run_pruned(0)  # compile
    t_p, n_p = run_pruned(1)
    run_unpruned(0)  # compile
    t_u, n_u = run_unpruned(1)

    thr_p = n_p / t_p
    thr_u = n_u / t_u
    suffix = (f"_{scale}" + (f"_{quant}" if quant else "")
              + ("_w8a8" if getattr(cfg.text, "act_quant", "none") != "none" else ""))
    return {
        "metric": f"gp_serving_generated_tokens_per_sec_chip{suffix}",
        "value": round(thr_p, 1),
        "unit": "tokens/s",
        "vs_baseline": round(thr_p / thr_u, 3),
        "detail": {
            "protocol": "max-feasible-batch generate, %d new tokens/row, "
                        "%d-token images; prefill chunks of %d; decode "
                        "pruned B=%d vs unpruned B=%d"
                        % (n_dec, int(prep.n_img_tokens[0]), chunk_b,
                           rows_p, rows_u),
            "pruned_batch": rows_p,
            "unpruned_batch": rows_u,
            "pruned_wall_s": round(t_p, 2),
            "unpruned_wall_s": round(t_u, 2),
            "pruned_tok_s": round(thr_p, 1),
            "unpruned_tok_s": round(thr_u, 1),
            "n_image_tokens": int(prep.n_img_tokens[0]),
            "n_decode": n_dec,
            "retention": cfg.gp.max_remain_ratio,
            "act_quant": getattr(cfg.text, "act_quant", "none"),
            "weights": ("real-random-quantized"
                        if quant and _os.environ.get("BENCH_REAL_WEIGHTS")
                        else "placeholder-zero" if quant else "real-random"),
            "device": str(jax.devices()[0]),
        },
    }


def run_continuous_side(scale: str, side: str):
    """ONE side of the continuous-batching protocol (VERDICT r2 #3 / r4 #1):
    a slot scheduler admits a row into the decode batch the moment its B=1
    prefill lands, interleaving decode chunks between admissions — the
    reference's my_lmms_eval/infer_cot.py protocol has no analogue; this is
    the shape of a real serving loop (vLLM-style admission) on one chip.

    Mechanics live in glimpseprune_tpu/serving.ContinuousBatcher (global
    write cursor over one preallocated cache; tested request-for-request
    against generate() in tests/test_serving.py). The win reported is
    time-to-first-token, measured per row at admission sync.

    Sides run in SEPARATE processes (main's continuous mode): the two
    feasibility frontiers differ — continuous batching holds admission-time
    prefill temps beside the FULL resident decode cache, so the unpruned
    side caps at B=5 here while the aggregated protocol's in-place assembly
    fits B=7 (the r4 regression: reusing the aggregated probe's rows_u=7
    OOMed every continuous run, and the retry ladder stepped down the
    pruned side — the side that was fine). B comes from
    BENCH_SERVE_ROWS_P/_U per `side`; tok/s counts n_dec real tokens per
    row; pre-admission/post-completion garbage lanes are uncounted.
    """
    import gc
    import os as _os
    import time as _t

    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.serving import ContinuousBatcher

    s = _serving_setup(scale)
    cfg, quant, prep, params, runner = s["cfg"], s["quant"], s["prep"], s["params"], s["runner"]
    dev_inputs, vanilla_static = s["dev_inputs"], s["vanilla_static"]
    pruned_prefill, unpruned_prefill = s["pruned_prefill"], s["unpruned_prefill"]
    n_dec = s["n_dec"]
    inter = int(_os.environ.get("BENCH_SERVE_INTER_STEPS", "8"))
    B = s["rows_p"] if side == "pruned" else s["rows_u"]
    i0 = 0 if side == "pruned" else 40

    def _note(msg):
        import sys as _sys
        _sys.stderr.write(f"[continuous {_t.strftime('%H:%M:%S')}] {msg}\n")
        _sys.stderr.flush()

    def prefill_p(i):
        out = pruned_prefill({"params": params}, dev_inputs, jnp.float32(i),
                             out_len=prep.out_len)
        return (out.logits[:1], out.valid[:1], out.position_ids[:, :1],
                out.kv_k[:, :1], out.kv_v[:, :1])

    def prefill_u(i):
        u_logits, u_kv_k, u_kv_v = unpruned_prefill(
            {"params": params}, dev_inputs, vanilla_static, jnp.float32(i))
        return (u_logits[:1], vanilla_static["valid"][:1],
                vanilla_static["position_ids"][:, :1], u_kv_k[:, :1],
                u_kv_v[:, :1])

    prefill_one = prefill_p if side == "pruned" else prefill_u
    _note(f"setup done; {side} side B={B} starting")
    # warm pass: one prefill (reveals R + compiles the prefill executable)
    # + batcher.warm (compiles admit/chunk); the timed serve then
    # re-prefills every row compile-free
    w = prefill_one(i0 * 131 + 997)
    R = int(w[1].shape[1])
    _note(f"  warm prefill done (R={R}); compiling batcher B={B}")
    batcher = ContinuousBatcher(
        runner, capacity=B, prefix_len=R, max_new_tokens=n_dec,
        inter_steps=inter, eos=-1)
    batcher.warm(w)
    _note("  batcher warm done; timed serve starting")
    del w
    gc.collect()
    t0 = _t.perf_counter()
    reqs = [(lambda j=j: prefill_one(i0 * 131 + j)) for j in range(B)]
    _, n_gen, ttft, completion = batcher.serve(
        reqs, rng=jax.random.PRNGKey(i0))
    wall = _t.perf_counter() - t0
    _note(f"{side} side done in {wall:.1f}s")

    def stats(xs):
        return {"mean_s": round(float(np.mean(xs)), 2),
                "max_s": round(float(np.max(xs)), 2)}

    return {
        "side": side,
        "B": B,
        "wall_s": round(wall, 2),
        "n_gen": int(n_gen.sum()),
        "tok_s": round(float(n_gen.sum()) / wall, 1),
        "ttft": stats(ttft),
        "completion": stats(completion),
        "inter_steps": inter,
        "n_image_tokens": int(prep.n_img_tokens[0]),
        "n_decode": n_dec,
        "quant": quant,
        "act_quant": getattr(cfg.text, "act_quant", "none"),
        "weights": ("real-random-quantized"
                    if quant and _os.environ.get("BENCH_REAL_WEIGHTS")
                    else "placeholder-zero" if quant else "real-random"),
        "device": str(jax.devices()[0]),
    }


def _assert_device_reachable(timeout_s: int = 180, attempts: int = 3,
                             retry_wait_s: int = 60):
    """Fail fast (clear stderr + exit 1) instead of hanging the driver when
    the TPU tunnel is wedged: device init runs in a kill-able subprocess (an
    in-process jax import that hangs cannot be interrupted portably).

    Retries: back-to-back bench invocations (the measurement ladder) see
    transient probe failures right after the previous process released the
    chip — the tunnel needs ~1-3 min to accept a fresh attachment — so a
    failed probe waits and retries before declaring the tunnel down."""
    import subprocess
    import time as _t

    if os.environ.get("BENCH_SKIP_DEVICE_PROBE"):
        return
    # The child re-asserts the requested platform via jax.config.update:
    # on this machine the axon plugin ignores JAX_PLATFORMS=cpu env alone
    # and its backend init hangs when the tunnel is down, so a CPU-pinned
    # run must never let the plugin initialize (same dance as
    # tests/conftest.py).
    child = (
        "import os, jax; "
        "plat = (os.environ.get('JAX_PLATFORMS') or '').lower(); "
        "plat and jax.config.update('jax_platforms', plat); "
        "import jax.numpy as jnp; "
        "x = jnp.ones((256, 256), jnp.bfloat16); "
        "print(float((x @ x).sum()))"
    )
    ok = False
    for attempt in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, "-c", child],
                timeout=timeout_s, capture_output=True, text=True,
            )
            ok = p.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        if attempt < attempts - 1:
            sys.stderr.write(
                f"bench: device probe failed (attempt {attempt + 1}/"
                f"{attempts}) — waiting {retry_wait_s}s for the tunnel to "
                "accept a fresh attachment\n")
            _t.sleep(retry_wait_s)
    sys.stderr.write(
        f"bench: device unreachable ({attempts} probes failed/timed out, "
        f"{timeout_s}s each) — the TPU tunnel is likely down; aborting "
        "instead of hanging\n")
    raise SystemExit(1)


def _evict_background_ladder():
    """Only ONE timed workload may touch the chip (CLAUDE.md). A detached
    measurement ladder (/tmp/chip_ladder*.sh, pid in /tmp/ladder.pid) may be
    waiting for the tunnel or mid-run when the driver launches bench —
    terminate its process group by EXACT recorded pid so this bench's
    numbers are clean. Ladder-internal bench invocations opt out via
    BENCH_FROM_LADDER=1."""
    import signal
    import time as _time

    if os.environ.get("BENCH_FROM_LADDER"):
        return
    try:
        with open("/tmp/ladder.pid") as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return
    try:
        pgid = os.getpgid(pid)
    except ProcessLookupError:
        return
    if pgid == os.getpgid(0):
        return  # same group as us: never self-terminate
    sys.stderr.write(
        f"bench: stopping background measurement ladder (pid {pid}) — "
        "one timed workload at a time\n")
    try:
        os.killpg(pgid, signal.SIGTERM)
        _time.sleep(3)
        os.killpg(pgid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        pass
    _time.sleep(2)  # let any in-flight device work drain


def main():
    # default = the reference's flagship 7B (int8 so it fits one chip);
    # fall back through smaller shapes on tunnel/compile failures.
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    _evict_background_ladder()
    _assert_device_reachable()
    scale = os.environ.get("BENCH_SCALE", "7b")
    if scale == "7b" and not os.environ.get("BENCH_QUANT"):
        os.environ["BENCH_QUANT"] = "int8"
    if (os.environ.get("BENCH_QUANT") == "int8"
            and "BENCH_ACT_QUANT" not in os.environ):
        # serving default: W8A8 on the compute-bound prefill paths (14%
        # faster pruned prefill measured at 16k tokens), decode stays
        # weight-only (HBM-bound; full-W8A8 decode measured pathological)
        os.environ["BENCH_ACT_QUANT"] = "prefill"
    mode = os.environ.get("BENCH_MODE", "serving")
    # headline runs exercise realistic logits (VERDICT r3 #5): real-random
    # quantized weights unless explicitly disabled. Timing-neutral
    # (placeholder delta measured, docs/ROUND4.md §8); drawn on-device in
    # one jitted program (fastinit.device_random_params) — seconds, and
    # the same compact HBM layout as the placeholder init.
    if os.environ.get("BENCH_REAL_WEIGHTS") in ("0", ""):
        os.environ.pop("BENCH_REAL_WEIGHTS", None)
    elif "BENCH_REAL_WEIGHTS" not in os.environ and os.environ.get("BENCH_QUANT"):
        os.environ["BENCH_REAL_WEIGHTS"] = "1"
    if mode == "continuous":
        # Each SIDE runs in its own fresh subprocess with its own OOM
        # step-down ladder (r4 regression postmortem: the sides' frontiers
        # differ — continuous holds admission prefill temps beside the full
        # resident decode cache, so the unpruned side caps BELOW the
        # aggregated protocol's rows_u=7 — and the old single-process retry
        # stepped down the PRUNED side when the unpruned one OOMed, burning
        # 3 x ~13 min of recompiles into a timeout. Fresh processes also
        # avoid the in-process retry leaking the failed attempt's ~9 GB
        # param tree into the next one, measured r3).
        import subprocess

        def side_ladder(side, ladder):
            for b in ladder:
                var = ("BENCH_SERVE_ROWS_P" if side == "pruned"
                       else "BENCH_SERVE_ROWS_U")
                env = dict(os.environ, **{var: str(b)})
                # stderr inherits (phase-progress lines stay visible under
                # an outer log/timeout); stdout captured for the JSON line
                p = subprocess.run(
                    [sys.executable, "-c",
                     "import json, bench; print(json.dumps("
                     f"bench.run_continuous_side({scale!r}, {side!r})))"],
                    env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
                    stdout=subprocess.PIPE, text=True)
                line = (p.stdout.strip().splitlines() or [""])[-1]
                if p.returncode == 0 and line.startswith("{"):
                    return json.loads(line)
                sys.stderr.write(
                    f"continuous {side} side failed at B={b} "
                    f"(rc={p.returncode}); retrying smaller\n")
            raise RuntimeError(
                f"continuous bench {side} side failed at all batch sizes")

        def dedup(xs):
            seen, out = set(), []
            for x in xs:
                if x >= 1 and x not in seen:
                    seen.add(x)
                    out.append(x)
            return out

        rows_p0 = int(os.environ.get("BENCH_SERVE_ROWS_P", "8"))
        rows_u0 = int(os.environ.get("BENCH_SERVE_ROWS_U", "7"))
        pr = side_ladder("pruned", dedup([rows_p0, rows_p0 // 2, 4]))
        # The unpruned side is independent of the pruned B: a frontier
        # ladder sweeping pruned B within one (kv, weights) tier may cache
        # its row (the 16k-context batcher compile alone is ~13 min) via
        # BENCH_CONT_UNPRUNED_CACHE=<json path>. The reused row is marked
        # in detail.unpruned_reused.
        un_cache = os.environ.get("BENCH_CONT_UNPRUNED_CACHE")
        un = None
        if un_cache and os.path.exists(un_cache):
            with open(un_cache) as f:
                un = json.load(f)
            if un.get("quant") != pr["quant"] or un.get("n_decode") != pr["n_decode"]:
                un = None  # stale cache from another tier — remeasure
        un_reused = un is not None
        if un is None:
            un = side_ladder("unpruned",
                             dedup([rows_u0, rows_u0 - 2, rows_u0 // 2, 3, 2]))
            if un_cache:
                with open(un_cache, "w") as f:
                    json.dump(un, f)
        suffix = (f"_{scale}" + (f"_{pr['quant']}" if pr["quant"] else "")
                  + ("_w8a8" if pr["act_quant"] != "none" else ""))
        print(json.dumps({
            "metric": f"gp_serving_continuous_tokens_per_sec_chip{suffix}",
            "value": pr["tok_s"],
            "unit": "tokens/s",
            "vs_baseline": round(pr["tok_s"] / un["tok_s"], 3),
            "detail": {
                "protocol": "continuous batching: admit-on-prefill-"
                            "completion, %d-step decode chunks interleaved; "
                            "%d new tokens/row; pruned B=%d vs unpruned "
                            "B=%d (each side at its own continuous-feasible "
                            "max, fresh process per side)"
                            % (pr["inter_steps"], pr["n_decode"],
                               pr["B"], un["B"]),
                "pruned_batch": pr["B"],
                "unpruned_batch": un["B"],
                "pruned_wall_s": pr["wall_s"],
                "unpruned_wall_s": un["wall_s"],
                "pruned_tok_s": pr["tok_s"],
                "unpruned_tok_s": un["tok_s"],
                "pruned_ttft": pr["ttft"],
                "unpruned_ttft": un["ttft"],
                "pruned_completion": pr["completion"],
                "unpruned_completion": un["completion"],
                "unpruned_reused": un_reused,
                "inter_steps": pr["inter_steps"],
                "n_image_tokens": pr["n_image_tokens"],
                "n_decode": pr["n_decode"],
                "act_quant": pr["act_quant"],
                "weights": pr["weights"],
                "device": pr["device"],
            },
        }))
        return
    if mode == "serving":
        # VERDICT r4 #7: re-measure the 16k-token 7B train step every round
        # (driver-visible in BENCH detail instead of builder-trusted).
        # Runs FIRST in its own bounded subprocess so the chip is exclusive
        # (serving params aren't resident yet) and a hang can't kill the
        # serving headline. Opt out with BENCH_TRAIN_ROW=0.
        train_row = None
        if (os.environ.get("BENCH_TRAIN_ROW", "1") != "0"
                and scale == "7b"
                and os.environ.get("BENCH_QUANT") == "int8"):
            import subprocess

            here = os.path.dirname(os.path.abspath(__file__))
            try:
                p = subprocess.run(
                    [sys.executable, os.path.join(here, "tools",
                                                  "profile_train_step.py"),
                     "--scale", "7b", "--quant", "int8", "--img-side",
                     "3584", "--steps", "3", "--json"],
                    cwd=here, stdout=subprocess.PIPE, text=True, timeout=900)
                line = (p.stdout.strip().splitlines() or [""])[-1]
                if p.returncode == 0 and line.startswith("{"):
                    train_row = json.loads(line)
                else:
                    sys.stderr.write(
                        f"train-step row failed (rc={p.returncode}); "
                        "serving continues without it\n")
            except subprocess.TimeoutExpired:
                sys.stderr.write("train-step row timed out (900s); "
                                 "serving continues without it\n")
        try:
            result = run_serving(scale)
            if train_row is not None:
                result["detail"]["gp_train_step_s_16k_7b_int8"] = train_row
            print(json.dumps(result))
            return
        except Exception as e:
            import gc
            import traceback

            sys.stderr.write(
                f"serving bench failed ({type(e).__name__}: {e}); falling "
                "back to e2e protocol\n")
            traceback.print_exc()
            # the exception's frames pin run_serving's device buffers
            # (params, caches) — release them or the fallback OOMs
            traceback.clear_frames(e.__traceback__)
            del e
            gc.collect()
    try:
        result = run(scale)
    except Exception as e:  # OOM etc: fall back to the smaller shape
        if scale == "7b":
            sys.stderr.write(f"7b bench failed ({type(e).__name__}: {e}); retrying 3b\n")
            os.environ.pop("BENCH_QUANT", None)
            try:
                result = run("3b")
            except Exception as e2:
                sys.stderr.write(f"3b bench failed ({type(e2).__name__}: {e2}); retrying 1b\n")
                result = run("1b")
        elif scale == "3b":
            sys.stderr.write(f"{scale} bench failed ({type(e).__name__}: {e}); retrying 1b\n")
            result = run("1b")
        else:
            raise
    print(json.dumps(result))


if __name__ == "__main__":
    main()
