#!/usr/bin/env python
"""Profile the pruned-prefill pipeline stage by stage on the TPU.

Breaks the bench.py headline into: vision encode, glimpse encode (layers
0..reduce + harvest + fuser), reduce+resume (compaction + remaining layers),
plus microbenchmarks of the flash-attention kernel and a pure-matmul floor at
the same shapes. Measurement protocol follows docs/ROUND1.md (perturbed
inputs, scalar host-read sync, tunnel RTT subtracted).

Usage: BENCH_SCALE=7b BENCH_QUANT=int8 BENCH_MAX_PIXELS=12845056 \
       python tools/profile_prefill.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def profile_vision(cfg, runner, params, inputs, timeit):
    """Stage-level ViT profile: windowed run, one full-attention block, the
    full-att flash kernel alone, merger — at the real packed patch shape."""
    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.models.qwen2_5_vl.vision import _block_fwd
    from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention
    from glimpseprune_tpu.ops.rope import vision_rope_cos_sin

    v = cfg.vision
    P = inputs["patches"].shape[0]
    H = v.hidden_size
    win = v.window_size // v.spatial_merge_size // v.patch_size
    wp = win * win * v.spatial_merge_unit
    rng = jax.random.PRNGKey(2)
    x = jax.device_put(jax.random.normal(rng, (P, H), jnp.bfloat16))
    blocks = params["visual"]["blocks"]

    @functools.partial(jax.jit, static_argnums=(3,))
    def one_block(blocks, x, inputs, wp_, i):
        pb = jax.tree_util.tree_map(lambda a: a[0], blocks)
        cos, sin = vision_rope_cos_sin(inputs["vis_pos_ids"], v.head_dim)
        return _block_fwd(
            v, pb, x + i * 1e-6, cos.astype(x.dtype), sin.astype(x.dtype),
            inputs["full_seg"], inputs["vis_valid"], wp_, jnp.bfloat16,
        ).astype(jnp.float32).sum() * 1e-9

    t_win = timeit(lambda i: one_block(blocks, x, inputs, wp, i),
                   f"1 windowed block P={P}")
    t_full = timeit(lambda i: one_block(blocks, x, inputs, 0, i),
                    "1 full-attention block")

    hq, hd = v.num_heads, v.head_dim
    q = jax.device_put(jax.random.normal(rng, (1, hq, P, hd), jnp.bfloat16))
    seg = jnp.asarray(inputs["full_seg"])[None]

    @jax.jit
    def fa(q, seg, i):
        out = flash_attention(q + i * 1e-6, q, q, seg, seg, causal=False)
        return out.astype(jnp.float32).sum() * 1e-9

    t_fa = timeit(lambda i: fa(q, seg, i), f"vision flash full-att P={P} D={hd}")
    fl = 4 * P * P * hq * hd
    print(f"  full-att flops {fl/1e12:.1f} TF -> {fl/(t_fa*1e-3)/1e12:.0f} TF/s")

    @jax.jit
    def mm(x, blocks, i):
        pb = jax.tree_util.tree_map(lambda a: a[0], blocks)
        h = x + i * 1e-6
        from glimpseprune_tpu.models.qwen2_5_vl.vision import _dense
        a = _dense(h, pb["attn"]["qkv"], jnp.bfloat16)
        b = _dense(h, pb["mlp"]["gate_proj"], jnp.bfloat16)
        cdd = _dense(h, pb["mlp"]["up_proj"], jnp.bfloat16)
        d = _dense(b * cdd, pb["mlp"]["down_proj"], jnp.bfloat16)
        e = _dense(h, pb["attn"]["proj"], jnp.bfloat16)
        return (a.astype(jnp.float32).sum() + d.astype(jnp.float32).sum()
                + e.astype(jnp.float32).sum()) * 1e-9

    t_mm = timeit(lambda i: mm(x, blocks, i), "1 vision block matmuls only")

    # patch embed + merger bracket the block stack (VERDICT r4 #5: account
    # for ALL of the vision wall, not just the blocks)
    vp = params["visual"]

    @jax.jit
    def embed_fn(vp, patches, i):
        h = (patches + i * 1e-6).astype(jnp.bfloat16) @ vp["patch_embed"]["kernel"].astype(jnp.bfloat16)
        return h.astype(jnp.float32).sum() * 1e-9

    t_embed = timeit(lambda i: embed_fn(vp, inputs["patches"], i), "patch_embed")

    mu = v.spatial_merge_unit

    @jax.jit
    def merger_fn(vp, x, i):
        from glimpseprune_tpu.models.qwen2_5_vl.vision import _rms

        m = _rms(x + i * 1e-6, vp["merger_ln_q"]["weight"])
        m = m.reshape(-1, mu * v.hidden_size)
        m = m @ vp["merger_fc1"]["kernel"].astype(x.dtype) + vp["merger_fc1"]["bias"].astype(x.dtype)
        import flax.linen as nn

        m = nn.gelu(m, approximate=False)
        m = m @ vp["merger_fc2"]["kernel"].astype(x.dtype) + vp["merger_fc2"]["bias"].astype(x.dtype)
        return m.astype(jnp.float32).sum() * 1e-9

    t_merge = timeit(lambda i: merger_fn(vp, x, i), "merger (rms+fc1+gelu+fc2)")

    n_full = len(v.fullatt_block_indexes)
    n_win = v.depth - n_full
    total = t_embed + n_win * t_win + n_full * t_full + t_merge
    print(f"  -> extrapolated: embed {t_embed:.0f} + {n_win} windowed x "
          f"{t_win:.0f}ms + {n_full} full x {t_full:.0f}ms + merger "
          f"{t_merge:.0f}ms = {total:.0f}ms; block matmul floor "
          f"{v.depth*t_mm:.0f}ms")
    print(f"  per-block attention cost: windowed {t_win - t_mm:.1f}ms, "
          f"full {t_full - t_mm:.1f}ms (flash kernel alone {t_fa:.1f}ms)")


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp

    from bench import build_cfg
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import (
        GlimpsePruneRunner,
        prepare_inputs,
    )

    scale = os.environ.get("BENCH_SCALE", "7b")
    cfg = build_cfg(scale)
    if os.environ.get("BENCH_QUANT", "int8" if scale == "7b" else "") == "int8":
        from glimpseprune_tpu.quantization import quantized_config

        cfg = quantized_config(cfg)
    rng = np.random.default_rng(0)
    max_px = int(os.environ.get("BENCH_MAX_PIXELS", "0")) or 1036 * 1036
    side = int((max_px * 1.3) ** 0.5)
    img = rng.integers(0, 255, (side, side, 3), dtype=np.uint8)
    prompt = (
        [int(x) for x in rng.integers(5, 100000, 24)]
        + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        + [int(x) for x in rng.integers(5, 100000, 24)]
    )
    prep = prepare_inputs(cfg, [prompt], [img], max_pixels=max_px)
    print(f"S={prep.input_ids.shape[1]} n_img={int(prep.n_img_tokens[0])} "
          f"patches={prep.patches.shape} out_len={prep.out_len}")

    model = Qwen2_5_VL_GP(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    init_jit = jax.jit(model.init, static_argnums=(16,))
    params = init_jit(
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
    runner = GlimpsePruneRunner(cfg, params, dtype=jnp.bfloat16)
    inputs = runner._device_inputs(prep, False)

    trivial = jax.jit(lambda x: x + 1)
    float(trivial(jnp.zeros(8))[0])
    rtts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(trivial(jnp.full((8,), float(i)))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"tunnel rtt ~{rtt*1e3:.1f}ms")

    def timeit(fn, label, iters=3):
        t0 = time.perf_counter()
        float(fn(jnp.float32(0.0)))
        compile_s = time.perf_counter() - t0
        ts = []
        for i in range(1, iters + 1):
            t0 = time.perf_counter()
            float(fn(jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - rtt) * 1e3
        print(f"{label:32s} {ms:9.1f} ms   (compile {compile_s:.0f}s)")
        return ms

    # ---- stage 1: vision encode (params/inputs as ARGS — closing over
    # them bakes 300MB of constants into the remote-compile request)
    @jax.jit
    def vis_fn(params, inputs, i):
        merged, taps = runner.model.apply(
            params, inputs["patches"] + i * 1e-6,
            inputs["vis_pos_ids"], inputs["full_seg"], inputs["vis_valid"],
            method=runner.model.vision_encode,
        )
        acc = merged.astype(jnp.float32).sum() * 1e-9
        for t in taps:
            acc = acc + t.astype(jnp.float32).sum() * 1e-12
        return acc

    p_ = {"params": params}
    t_vis = timeit(lambda i: vis_fn(p_, inputs, i), "vision_encode")

    # ---- stage 2: vision + glimpse encode (layers 0..reduce + fuser)
    @jax.jit
    def enc_fn(params, inputs, i):
        merged, taps = runner.model.apply(
            params, inputs["patches"] + i * 1e-6,
            inputs["vis_pos_ids"], inputs["full_seg"], inputs["vis_valid"],
            method=runner.model.vision_encode,
        )
        taps = jnp.stack(taps, axis=0)

        def enc(m):
            return m.glimpse_encode(
                input_ids=inputs["input_ids"], valid=inputs["valid"],
                position_ids=inputs["position_ids"], image_embeds=merged,
                taps=taps, packed_idx=inputs["packed_idx"],
                img_slots=inputs["img_slots"], img_valid=inputs["img_valid"],
                fuser_window_index=inputs["fuser_window_index"],
                fuser_reverse_index=inputs["fuser_reverse_index"],
                fuser_segment_ids=inputs["fuser_segment_ids"],
                fuser_pos_ids=inputs["fuser_pos_ids"],
                le_start=inputs.get("le_start"),
                img_group=inputs.get("img_group"),
            )

        ml, state, _ = runner.model.apply(params, method=enc)
        return (ml.astype(jnp.float32).sum() * 1e-9
                + state.kv_k.astype(jnp.float32).sum() * 1e-12)

    t_enc = timeit(lambda i: enc_fn(p_, inputs, i), "vision + glimpse_encode")

    # ---- stage 3: full pruned prefill (encode + reduce + resume)
    @functools.partial(jax.jit, static_argnums=(2,))
    def full_fn(params, inputs, out_len, i):
        ins = dict(inputs)
        ins["patches"] = ins["patches"] + i * 1e-6
        out = runner._prefill_impl(params, ins, out_len, False)
        return (out.logits.astype(jnp.float32)[0, -1, :8].sum()
                + out.kv_k.astype(jnp.float32).sum() * 1e-12)

    t_full = timeit(lambda i: full_fn(p_, inputs, prep.out_len, i),
                    "full pruned prefill")

    if os.environ.get("PROFILE_VISION"):
        profile_vision(cfg, runner, params, inputs, timeit)

    # ---- micro: flash attention at the prefill shape
    c = cfg.text
    S = prep.input_ids.shape[1]
    qkv_rng = jax.random.PRNGKey(1)
    q = jax.device_put(jax.random.normal(qkv_rng, (1, c.num_attention_heads, S, c.head_dim), jnp.bfloat16))
    k = jax.device_put(jax.random.normal(qkv_rng, (1, c.num_key_value_heads, S, c.head_dim), jnp.bfloat16))
    v = jax.device_put(jax.random.normal(qkv_rng, (1, c.num_key_value_heads, S, c.head_dim), jnp.bfloat16))
    seg = jnp.zeros((1, S), jnp.int32)

    @jax.jit
    def fa_fn(q, k, v, seg, i):
        from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

        out = flash_attention(q + i * 1e-6, k, v, seg, seg, causal=True)
        return out.astype(jnp.float32).sum() * 1e-9

    t_fa = timeit(lambda i: fa_fn(q, k, v, seg, i), f"flash_attention 1 layer S={S}")

    # ---- micro: one decoder layer's matmuls (floor)
    H, I = c.hidden_size, c.intermediate_size
    x = jax.device_put(jax.random.normal(qkv_rng, (S, H), jnp.bfloat16))
    wq = jax.device_put(jax.random.normal(qkv_rng, (H, H + 2 * c.num_key_value_heads * c.head_dim), jnp.bfloat16))
    wg = jax.device_put(jax.random.normal(qkv_rng, (H, 2 * I), jnp.bfloat16))
    wd = jax.device_put(jax.random.normal(qkv_rng, (I, H), jnp.bfloat16))
    wo = jax.device_put(jax.random.normal(qkv_rng, (H, H), jnp.bfloat16))

    @jax.jit
    def mm_fn(x, wq, wg, wd, wo, i):
        h = x + i * 1e-6
        a = h @ wq
        b_ = h @ wg
        cc = b_[:, :I] @ wd
        dd = h @ wo
        return (a.astype(jnp.float32).sum() + b_.astype(jnp.float32).sum()
                + cc.astype(jnp.float32).sum() + dd.astype(jnp.float32).sum()) * 1e-9

    t_mm = timeit(lambda i: mm_fn(x, wq, wg, wd, wo, i), "1-layer matmul floor")
    flops = 2 * S * H * (H + 2 * c.num_key_value_heads * c.head_dim + 2 * I + H) + 2 * S * I * H
    print(f"  matmul floor: {flops/1e9:.1f} GFLOP -> {flops/t_mm/1e9:.0f} GF/ms = {flops/(t_mm*1e-3)/1e12:.0f} TF/s")

    L = c.num_hidden_layers
    n_red = cfg.gp.reduce_layer + 1
    print(f"\nbreakdown: vision {t_vis:.0f}ms | glimpse({n_red} layers) "
          f"{t_enc - t_vis:.0f}ms | reduce+resume({L - n_red} layers) "
          f"{t_full - t_enc:.0f}ms | total {t_full:.0f}ms")
    print(f"per-layer glimpse: {(t_enc - t_vis)/n_red:.1f}ms vs floor "
          f"{t_mm:.1f}ms matmul + {t_fa:.1f}ms attention")


if __name__ == "__main__":
    main()
