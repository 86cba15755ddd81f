#!/usr/bin/env python
"""Profile ONE GP train step at a chosen image size (the long-context axis).

The reference trains at max_pixels=12845056 (~16.4k visual tokens,
train_qwen_gp.py:1645-1648) with flash_attention_2 fwd+bwd. With the XLA
recompute backward this point needs ~30 GB of transient logits PER LAYER;
the pallas flash backward (ops/pallas/flash_attention.py) makes it a
one-chip workload. This tool measures it: step wall-clock + XLA
memory_analysis for the jitted train step.

Usage (16.4k tokens = the reference's training regime):
  python tools/profile_train_step.py --scale 7b --quant int8 --img-side 3584
CPU smoke (construction path only):
  JAX_PLATFORMS=cpu python tools/profile_train_step.py --scale tiny --img-side 96
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="7b", choices=["tiny", "1b", "3b", "7b"])
    ap.add_argument("--quant", default="int8", choices=["", "int8", "int4"])
    ap.add_argument("--img-side", type=int, default=3584,
                    help="3584 px ~= 16.4k visual tokens (reference regime)")
    ap.add_argument("--max-pixels", type=int, default=12845056,
                    help="smart_resize cap; default = the reference's "
                         "training cap (train_qwen_gp.py:1645-1648)")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--json", action="store_true",
                    help="emit one machine-readable JSON line at the end "
                         "(bench.py embeds it in the serving detail so the "
                         "driver re-measures the train step every round)")
    args = ap.parse_args()

    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp
    import optax

    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs
    from glimpseprune_tpu.training import init_train_state, make_train_step

    if args.scale == "tiny":
        from glimpseprune_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        seq_mult, patch_mult = 8, 16
        dtype = param_dtype = jnp.float32
    else:
        from bench import build_cfg

        cfg = build_cfg(args.scale)
        seq_mult, patch_mult = 64, 256
        dtype = param_dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (args.img_side, args.img_side, 3), dtype=np.uint8)
    prompt = ([5, 6] + [cfg.vision_start_token_id, cfg.image_token_id,
                        cfg.vision_end_token_id] + [7, 8])
    prep = prepare_inputs(cfg, [prompt], [img], seq_multiple=seq_mult,
                          patch_multiple=patch_mult,
                          normed_bboxes=[[[0.2, 0.2, 0.5, 0.5]]],
                          answer_ids=[[9, 10, 11, 12]],
                          max_pixels=args.max_pixels or None)
    n_img_tokens = int(np.sum(np.asarray(prep.input_ids) == cfg.image_token_id))
    print(f"image {args.img_side}px -> {n_img_tokens} visual tokens, "
          f"seq {prep.input_ids.shape[1]}, packed patches {prep.patches.shape[0]}")

    model0 = Qwen2_5_VL_GP(cfg, dtype=dtype, param_dtype=param_dtype)
    init_args = (
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
    if args.quant and args.scale != "tiny":
        # fast host-init real weights directly in their quantized
        # representation (utils/fastinit.py; the exact flax init takes
        # 20+ min for 7B on this machine's one core, and the old
        # fp-generate-then-quantize chain ~40 — a step-TIME profile only
        # needs realistic magnitudes)
        from glimpseprune_tpu.quantization import quantized_config
        from glimpseprune_tpu.utils.fastinit import (
            device_random_params,
            fast_random_params,
        )

        cfg = quantized_config(cfg, args.quant)
        qmodel = Qwen2_5_VL_GP(cfg, dtype=dtype, param_dtype=param_dtype)
        if jax.devices()[0].platform != "cpu":
            params = device_random_params(qmodel, init_args[:-1], prep.out_len)
        else:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                qparams = fast_random_params(qmodel, init_args[:-1],
                                             prep.out_len)
            params = jax.device_put(qparams, jax.devices()[0])
            del qparams
    else:
        params = jax.jit(model0.init, static_argnums=(16,))(*init_args)["params"]

    import dataclasses

    if not cfg.text.remat:  # the trainer always remats (trainer.py:179-186)
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(cfg.text, remat=True))
    model = Qwen2_5_VL_GP(cfg, dtype=dtype, param_dtype=param_dtype)

    batch = {
        "input_ids": jnp.asarray(prep.input_ids),
        "valid": jnp.asarray(prep.valid),
        "position_ids": jnp.asarray(prep.position_ids),
        "patches": jnp.asarray(prep.patches),
        "vis_pos_ids": jnp.asarray(prep.vis_pos_ids),
        "full_seg": jnp.asarray(prep.full_seg),
        "vis_valid": jnp.asarray(prep.vis_valid),
        "packed_idx": jnp.asarray(prep.packed_idx),
        "img_slots": jnp.asarray(prep.img_slots),
        "img_valid": jnp.asarray(prep.img_valid),
        "fuser_window_index": jnp.asarray(prep.fuser.window_index),
        "fuser_reverse_index": jnp.asarray(prep.fuser.reverse_index),
        "fuser_segment_ids": jnp.asarray(prep.fuser.segment_ids),
        "fuser_pos_ids": jnp.asarray(prep.fuser.pos_ids),
        "le_start": jnp.asarray(prep.le_start),
        "ref_token_masks": jnp.asarray(prep.ref_token_masks),
        "labels": jnp.asarray(prep.labels),
    }

    opt = optax.adam(args.lr)
    step_fn = jax.jit(make_train_step(cfg, model, opt))
    state, frozen = init_train_state(params, opt)

    t0 = time.time()
    lowered = step_fn.lower(state, frozen, batch, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    print(f"compile: {time.time() - t0:.1f}s")
    mem = compiled.memory_analysis()
    if mem is not None:
        gb = 1024 ** 3
        print(f"memory_analysis: temp={mem.temp_size_in_bytes / gb:.2f} GB  "
              f"args={mem.argument_size_in_bytes / gb:.2f} GB  "
              f"output={mem.output_size_in_bytes / gb:.2f} GB  "
              f"alias={mem.alias_size_in_bytes / gb:.2f} GB")

    # tunnel RTT: the scalar-readback sync pays one round trip per timed
    # call (CLAUDE.md timing protocol) — measure and subtract it
    trivial = jax.jit(lambda x: x + 1)
    float(trivial(jnp.zeros(8))[0])  # compile + warm
    rtts = []
    for i in range(6):  # perturb each probe: identical calls cache-serve
        t0 = time.time()
        float(trivial(jnp.full((8,), float(i + 1)))[0])
        rtts.append(time.time() - t0)
    rtt = min(rtts)

    key = jax.random.PRNGKey(1)
    times = []
    for i in range(args.steps):
        key, sub = jax.random.split(key)  # perturbs an input every call
        t0 = time.time()
        state, metrics = step_fn(state, frozen, batch, sub)
        loss = float(metrics["loss"])  # sync: read one scalar back
        times.append(time.time() - t0 - rtt)
        print(f"step {i}: {times[-1]:.3f}s loss={loss:.4f}")
    steady = times[1:] or times
    print(f"steady step: {min(steady):.3f}s (median {sorted(steady)[len(steady)//2]:.3f}s, "
          f"rtt {rtt * 1e3:.0f}ms subtracted) at {n_img_tokens} visual tokens")
    if args.json:
        import json

        gb = 1024 ** 3
        print(json.dumps({
            "train_step_s": round(min(steady), 3),
            "train_step_median_s": round(sorted(steady)[len(steady) // 2], 3),
            "n_visual_tokens": n_img_tokens,
            "seq": int(prep.input_ids.shape[1]),
            "scale": args.scale,
            "quant": args.quant,
            "temp_gb": round(mem.temp_size_in_bytes / gb, 2) if mem else None,
            "args_gb": round(mem.argument_size_in_bytes / gb, 2) if mem else None,
        }))


if __name__ == "__main__":
    main()
