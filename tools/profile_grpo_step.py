#!/usr/bin/env python
"""Memory-profile the GlimpsePrune+ (GRPO) update step at 7B scale.

VERDICT r4 weak #5: the chunked completion-logprob forward
(`gp_model.completion_logprobs` -> `TextDecoder.chunked_token_logprobs`)
is equality-tested, but the memory it saves on the 7B RL step was asserted
("2 x 4.6 GB avoided"), never measured. This tool converts the claim into
an XLA `memory_analysis` row, the same instrument the SFT train step used
(docs/ROUND4.md section 5), WITHOUT needing weights: the step program is
AOT-lowered from ShapeDtypeStructs, so it runs in minutes on the chip
tunnel and allocates nothing.

Reports, for the jitted `make_grpo_loss_step` program (policy = int8
frozen base + bf16 LoRA, remat on — exactly what GRPOTrainer jits,
training/grpo.py:271-274):
  - temp/argument/output bytes of the real (chunked-head) step;
  - the same step with the naive full-logits policy forward
    (`completion_logits` + token_logprobs over [N, R+Tc, V]) — the path
    the reference's torch GRPO materializes twice
    (train_qwen_gp.py:1273-1339 policy + :1167-1181 reference logprobs);
  - the adapter-disabled ref-logps forward (compute_ref_logps), chunked
    vs naive, which is the second of the two avoided logits buffers.

Usage (the 7B GlimpsePrune+ regime: N = B*G rows of pruned prompts):
  python tools/profile_grpo_step.py --scale 7b --quant int8 \
      --rows 16 --prompt-len 2048 --completion-len 256
CPU smoke:
  JAX_PLATFORMS=cpu python tools/profile_grpo_step.py --scale tiny
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _mem_row(compiled):
    mem = compiled.memory_analysis()
    if mem is None:
        return None
    gb = 1024 ** 3
    return {
        "temp_gb": round(mem.temp_size_in_bytes / gb, 2),
        "args_gb": round(mem.argument_size_in_bytes / gb, 2),
        "out_gb": round(mem.output_size_in_bytes / gb, 2),
        "alias_gb": round(mem.alias_size_in_bytes / gb, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="7b", choices=["tiny", "1b", "3b", "7b"])
    ap.add_argument("--quant", default="int8", choices=["", "int8", "int4"])
    ap.add_argument("--rows", type=int, default=16,
                    help="N = B*G policy rows (reference: per-device batch "
                         "x num_generations)")
    ap.add_argument("--prompt-len", type=int, default=2048,
                    help="R: pruned-prompt length (16.4k visual tokens "
                         "pruned at ~92%% + text ~= 1.3-2k)")
    ap.add_argument("--completion-len", type=int, default=256)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp
    import optax

    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs
    from glimpseprune_tpu.training.grpo import (
        GRPOBatch,
        make_grpo_loss_step,
        token_logprobs,
        _completion_logps,
    )
    from glimpseprune_tpu.training.lora import make_lora_params

    if args.scale == "tiny":
        from glimpseprune_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        dtype = jnp.float32
    else:
        from bench import build_cfg

        cfg = build_cfg(args.scale)
        dtype = jnp.bfloat16
    if args.quant and args.scale != "tiny":
        from glimpseprune_tpu.quantization import quantized_config

        cfg = quantized_config(cfg, args.quant)

    # Frozen-tree SHAPES via eval_shape of the full model init (a tiny image
    # fixes the prep geometry; param shapes depend only on cfg). Nothing is
    # allocated anywhere in this tool.
    base_model = Qwen2_5_VL_GP(cfg, dtype=dtype, param_dtype=dtype)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
    prompt = [cfg.vision_start_token_id, cfg.image_token_id,
              cfg.vision_end_token_id, 5, 6]
    prep = prepare_inputs(cfg, [prompt], [img], seq_multiple=8,
                          patch_multiple=16)
    init_args = (
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index),
        jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start),
    )
    frozen_sh = jax.eval_shape(
        lambda *a: base_model.init(*a, prep.out_len), *init_args
    )["params"]
    n_frozen_bytes = sum(
        np.prod(l.shape) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(frozen_sh)
    )
    print(f"frozen tree ({args.quant or 'fp'}): "
          f"{n_frozen_bytes / 1024**3:.2f} GB across "
          f"{len(jax.tree_util.tree_leaves(frozen_sh))} leaves")

    # LoRA tree is real (small) arrays; everything else stays abstract.
    lora = make_lora_params(frozen_sh, rank=args.rank)
    lora_sh = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), lora
    )
    optimizer = optax.adamw(1e-5)
    opt_sh = jax.eval_shape(optimizer.init, lora_sh)

    # The policy model GRPOTrainer jits: in-scan LoRA slots + remat
    # (training/grpo.py:264-274).
    pcfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, lora_rank=args.rank,
                                      remat=True)
    )
    policy_model = Qwen2_5_VL_GP(pcfg, dtype=dtype, param_dtype=dtype)

    N, R, Tc = args.rows, args.prompt_len, args.completion_len
    H = cfg.text.hidden_size
    f32, i32 = jnp.float32, jnp.int32
    batch_sh = GRPOBatch(
        prompt_embeds=jax.ShapeDtypeStruct((N, R, H), dtype),
        prompt_valid=jax.ShapeDtypeStruct((N, R), jnp.bool_),
        prompt_pos=jax.ShapeDtypeStruct((3, N, R), i32),
        completion_ids=jax.ShapeDtypeStruct((N, Tc), i32),
        completion_valid=jax.ShapeDtypeStruct((N, Tc), jnp.bool_),
        completion_pos=jax.ShapeDtypeStruct((3, N, Tc), i32),
        advantages=jax.ShapeDtypeStruct((N,), f32),
        ref_logps=jax.ShapeDtypeStruct((N, Tc), f32),
    )
    V = cfg.text.vocab_size
    naive_gb = N * (R + Tc) * V * 4 / 1024**3
    print(f"GRPO rows N={N} (B*G), R={R}, Tc={Tc}; one full-seq f32 logits "
          f"buffer would be {naive_gb:.2f} GB")

    rows = {}

    # 1. The real step (chunked completion_logprobs policy forward + bwd).
    step = make_grpo_loss_step(policy_model, optimizer)
    t0 = time.time()
    compiled = jax.jit(step).lower(lora_sh, opt_sh, frozen_sh,
                                   batch_sh).compile()
    rows["step_chunked"] = _mem_row(compiled)
    print(f"[1] GRPO step, chunked head (the shipped path): "
          f"{rows['step_chunked']}  (compile {time.time() - t0:.0f}s)")

    # 2. Naive variant: policy forward materializes [N, R+Tc, V] logits
    #    (what the torch reference does, train_qwen_gp.py:1273-1339).
    def naive_loss_step(lora, opt_state, frozen, batch):
        from glimpseprune_tpu.training.grpo import (
            grpo_surrogate,
            k3_kl,
        )
        from glimpseprune_tpu.training.lora import insert_lora

        def loss_fn(lora_p):
            params = insert_lora(frozen, lora_p)
            logits = policy_model.apply(
                {"params": params},
                batch.prompt_embeds, batch.prompt_valid, batch.prompt_pos,
                batch.completion_ids, batch.completion_valid,
                batch.completion_pos,
                method=policy_model.completion_logits,
            )
            r = batch.prompt_embeds.shape[1]
            logps = token_logprobs(logits[:, r - 1:-1], batch.completion_ids)
            cmask = batch.completion_valid.astype(jnp.float32)
            return (grpo_surrogate(logps, batch.advantages, cmask)
                    + 0.04 * k3_kl(logps, batch.ref_logps, cmask))

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    t0 = time.time()
    compiled_n = jax.jit(naive_loss_step).lower(lora_sh, opt_sh, frozen_sh,
                                                batch_sh).compile()
    rows["step_full_logits"] = _mem_row(compiled_n)
    print(f"[2] GRPO step, full-logits head (reference-style): "
          f"{rows['step_full_logits']}  (compile {time.time() - t0:.0f}s)")

    # 3. The adapter-disabled ref-logps forward (the OTHER logits buffer the
    #    chunked head avoids) — chunked vs naive, forward-only.
    def ref_fwd(frozen, batch):
        return _completion_logps(base_model, frozen, batch)

    def ref_fwd_naive(frozen, batch):
        logits = base_model.apply(
            {"params": frozen},
            batch.prompt_embeds, batch.prompt_valid, batch.prompt_pos,
            batch.completion_ids, batch.completion_valid,
            batch.completion_pos,
            method=base_model.completion_logits,
        )
        r = batch.prompt_embeds.shape[1]
        return token_logprobs(logits[:, r - 1:-1], batch.completion_ids)

    rows["ref_fwd_chunked"] = _mem_row(
        jax.jit(ref_fwd).lower(frozen_sh, batch_sh).compile())
    rows["ref_fwd_full_logits"] = _mem_row(
        jax.jit(ref_fwd_naive).lower(frozen_sh, batch_sh).compile())
    print(f"[3] ref-logps fwd chunked: {rows['ref_fwd_chunked']}")
    print(f"[4] ref-logps fwd full-logits: {rows['ref_fwd_full_logits']}")

    if rows["step_chunked"] and rows["step_full_logits"]:
        d_step = (rows["step_full_logits"]["temp_gb"]
                  - rows["step_chunked"]["temp_gb"])
        d_ref = (rows["ref_fwd_full_logits"]["temp_gb"]
                 - rows["ref_fwd_chunked"]["temp_gb"])
        fit = rows["step_chunked"]["temp_gb"] + rows["step_chunked"]["args_gb"]
        print(f"chunked head saves {d_step:.2f} GB temp on the update step "
              f"and {d_ref:.2f} GB on the ref forward; "
              f"shipped step needs temp+args = {fit:.2f} GB")
    if args.json:
        print(json.dumps({
            "scale": args.scale, "quant": args.quant, "rows": N,
            "prompt_len": R, "completion_len": Tc, "rank": args.rank,
            "frozen_gb": round(n_frozen_bytes / 1024**3, 2), **{
                k: v for k, v in rows.items()
            },
        }))


if __name__ == "__main__":
    main()
