#!/usr/bin/env python
"""Multi-hundred-step convergence run on a synthetic boxes dataset.

Stand-in for the reference's <1 h / 20K-GQA base recipe (README.md:24,49):
images contain a bright rectangle on noise; the bbox is the supervision
target. The GP new-modules (fuser + glimpse embeddings) must learn to keep
exactly the box tokens — loss falls and mask IoU climbs if the recipe
converges. Writes train_log.json + a curve summary; --resume-from continues
a killed run (reference --resume_from_checkpoint).

Usage:
  python tools/convergence_run.py --scale 3b --steps 300 --out ckpt/conv
  python tools/convergence_run.py --scale 3b --steps 300 --out ckpt/conv \
      --resume-from ckpt/conv      # continue after a kill
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np


def make_synth_corpus(root: str, n: int, img_side: int, seed: int = 0):
    """Images: noise + one bright rectangle; label bbox = the rectangle."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs", "cot", "synth")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i in range(n):
        arr = rng.integers(0, 90, (img_side, img_side, 3), dtype=np.uint8)
        w = int(rng.integers(img_side // 6, img_side // 2))
        h = int(rng.integers(img_side // 6, img_side // 2))
        x0 = int(rng.integers(0, img_side - w))
        y0 = int(rng.integers(0, img_side - h))
        color = rng.integers(170, 255, (3,), dtype=np.uint8)
        arr[y0 : y0 + h, x0 : x0 + w] = color
        name = f"img{i}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=92)
        rows.append({
            "question": "Where is the bright rectangle?",
            "answer": f"at ({x0},{y0})",
            "image": name,
            "width": img_side,
            "height": img_side,
            "bboxs": [[float(x0), float(y0), float(x0 + w), float(y0 + h)]],
            "dataset": "synth",
            "split": "train",
        })
    jsonl = os.path.join(root, "synth_train.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return {
        "datasets": [{
            "json_path": jsonl,
            "mapper": "cot_train",
            "bbox_type": "xyxy",
            "additional_mappers": ["norm_bboxes"],
        }]
    }, os.path.join(root, "imgs")


def make_grpo_corpus(root: str, n: int, img_side: int, answers: str = "lr",
                     seed: int = 0):
    """GRPO task: bright rectangle on noise; the answer is a single char —
    'l'/'r' for which half the box center sits in (`answers=lr`, the visual
    task), or a constant 'x' (`answers=const`, the pure-RL sanity task).
    Single-char answers + the bijective char tokenizer below make
    `precision_match` a real 0/1 reward a random-init policy can discover by
    sampling (the environment has no checkpoints; the reference's RL stage
    trains against an LLM judge on real completions,
    train_qwen_gp.py:1122-1446 — this is the offline-scorer analogue
    VERDICT r3 #4 asks for)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs", "cot", "synthrl")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i in range(n):
        arr = rng.integers(0, 90, (img_side, img_side, 3), dtype=np.uint8)
        w = int(rng.integers(img_side // 4, img_side // 2))
        h = int(rng.integers(img_side // 4, img_side // 2))
        # keep the box center unambiguously in one half
        left = bool(rng.integers(0, 2))
        x0 = int(rng.integers(0, img_side // 2 - w)) if left else \
            int(rng.integers(img_side // 2, img_side - w))
        y0 = int(rng.integers(0, img_side - h))
        arr[y0 : y0 + h, x0 : x0 + w] = rng.integers(170, 255, (3,), dtype=np.uint8)
        name = f"rl{i}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=92)
        rows.append({
            "question": "which half?",
            "answer": ("l" if left else "r") if answers == "lr" else "x",
            "image": name,
            "width": img_side,
            "height": img_side,
            "bboxs": [[float(x0), float(y0), float(x0 + w), float(y0 + h)]],
            "dataset": "synthrl",
            "split": "train",
        })
    jsonl = os.path.join(root, "synthrl_train.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return {
        "datasets": [{
            "json_path": jsonl,
            "mapper": "cot_train",
            "bbox_type": "xyxy",
            "additional_mappers": ["norm_bboxes"],
        }]
    }, os.path.join(root, "imgs")


def char_tokenizer():
    """Bijective char<->id map (ids 5..132, inside every vocab we ship):
    detokenized completions are real strings, so the offline score funcs
    (precision_match / one_box_iou) judge them exactly as the reference's
    registry does (train_qwen_gp.py:715-802)."""
    def tok(t):
        return [5 + ord(c) for c in t[:48] if ord(c) < 128]

    def detok(ids):
        return "".join(chr(i - 5) if 5 <= i - 5 + 5 < 133 else "?" for i in ids)

    return tok, detok


def run_grpo(args):
    """GlimpsePrune+ convergence (VERDICT r3 #4): interleaves the base
    loc/le recipe (new modules keep training, as in the reference's joint
    plus loss train_qwen_gp.py:1531-1553) with on-policy GRPO steps on the
    LoRA adapter, scored by an offline score func. Logs mean reward,
    reward/kd losses, loc/le losses, and a periodic greedy probe (policy
    vs adapter-disabled accuracy on held-out samples) to grpo_log.json."""
    import time

    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.models.qwen2_5_vl.runner import (
        GlimpsePruneRunner,
        prepare_inputs,
    )
    from glimpseprune_tpu.training.data import GPDataset
    from glimpseprune_tpu.training.grpo import GRPOTrainer
    from glimpseprune_tpu.training.trainer import GPTrainer, TrainerConfig

    data_root = args.data_root or os.path.join(args.out, "data")
    os.makedirs(data_root, exist_ok=True)
    config, img_dir = make_grpo_corpus(
        data_root, args.n_samples, args.img_side if args.scale != "tiny" else 96,
        answers=args.grpo_answers,
    )
    tok, detok = char_tokenizer()

    if args.scale == "tiny":
        from tools.demo import make_tiny

        cfg, params, _ = make_tiny()
        seq_mult, patch_mult = 8, 16
        dtype = jnp.float32
    else:
        raise SystemExit(
            "--grpo convergence runs at --scale tiny (the RL machinery is "
            "scale-independent; the 3B/7B step time is measured separately "
            "by ROUND3.md's 2.8 s/step figure)")

    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP

    model = Qwen2_5_VL_GP(cfg, dtype=dtype, param_dtype=dtype)
    dataset = GPDataset(config, img_dir=img_dir, tokenize=tok)
    print(f"grpo dataset: {len(dataset)} samples, device={jax.devices()[0]}")

    def load_image(path):
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))

    tcfg = TrainerConfig(
        learning_rate=args.lr, batch_size=args.batch_size, num_epochs=1,
        log_every=10, save_every=0, output_dir=args.out,
        seq_multiple=seq_mult, patch_multiple=patch_mult,
    )
    trainer = GPTrainer(cfg, model, params, dataset, tok,
                        load_image=load_image, tcfg=tcfg)
    runner = GlimpsePruneRunner(cfg, trainer.params, dtype=dtype)
    grpo = GRPOTrainer(
        cfg, runner, dataset, tok, detok,
        num_generations=args.grpo_g, max_new_tokens=args.grpo_new_tokens,
        temperature=1.0, score_fn=args.grpo_score, lora_rank=args.grpo_rank,
        learning_rate=args.grpo_lr, seed=0,
    )

    # held-out probe set: greedy accuracy policy-vs-frozen is the cleanest
    # "the adapter changed the completions" evidence
    eval_samples = [dataset[i] for i in range(min(16, len(dataset)))]

    def probe(use_adapter: bool):
        r = grpo.policy_runner if use_adapter else runner
        if use_adapter:
            r.params = grpo._insert_lora(grpo.frozen, grpo.lora)
        else:
            r.params = trainer.params
        prompts = [
            [cfg.vision_start_token_id, cfg.image_token_id,
             cfg.vision_end_token_id] + tok(s.query)
            for s in eval_samples
        ]
        imgs = [load_image(s.img_path) for s in eval_samples]
        prep = prepare_inputs(cfg, prompts, imgs, seq_multiple=seq_mult,
                              patch_multiple=patch_mult)
        out = r._prefill({"params": r.params}, r._device_inputs(prep, False),
                         out_len=prep.out_len, use_ref_masks=False)
        seqs, n_gen = r._decode_loop(
            out.logits, out.valid, out.position_ids, out.kv_k, out.kv_v,
            args.grpo_new_tokens, cfg.eos_token_id)
        comps = [detok([int(x) for x in seqs[i, : n_gen[i]]])
                 for i in range(len(eval_samples))]
        acc = float(np.mean([c.strip() == s.answer.strip()
                             for c, s in zip(comps, eval_samples)]))
        return acc, comps

    history = []
    rng0 = jax.random.PRNGKey(1)
    order = np.random.default_rng(0)
    idx = []
    t0 = time.time()
    for step in range(1, args.steps + 1):
        if len(idx) < args.batch_size:
            idx = list(order.permutation(len(dataset)))
        samples = [dataset[idx.pop()] for _ in range(args.batch_size)]

        m = {}
        if args.grpo_base_every and step % args.grpo_base_every == 0:
            batch = trainer.collate(trainer.cfg, samples, tok, load_image, tcfg)
            trainer.state, bm = trainer.step_fn(
                trainer.state, trainer.frozen, batch,
                jax.random.fold_in(rng0, 2 * step))
            grpo.frozen = trainer.params  # new modules keep training
            runner.params = trainer.params
            m.update({k: float(v) for k, v in bm.items()
                      if k in ("loss", "loc_loss", "le_loss", "mask_iou")})

        gm = grpo.step_on_batch(samples, load_image,
                                jax.random.fold_in(rng0, 2 * step + 1))
        m.update(gm)
        m["step"] = step
        m["elapsed_s"] = time.time() - t0
        if step % args.grpo_probe_every == 0 or step == 1:
            acc_pol, comps = probe(use_adapter=True)
            acc_ref, _ = probe(use_adapter=False)
            m["probe_acc_policy"] = acc_pol
            m["probe_acc_frozen"] = acc_ref
            m["probe_completions"] = comps[:4]
            print(f"step {step:4d} reward {m['mean_score']:.3f} "
                  f"probe acc policy {acc_pol:.3f} vs frozen {acc_ref:.3f} "
                  f"loc {m.get('loc_loss', float('nan')):.3f} "
                  f"le {m.get('le_loss', float('nan')):.3f}", flush=True)
        history.append(m)
        if step % 10 == 0 or step == 1:
            # incremental dump: a killed run still leaves its curves
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(args.out, "grpo_log.json"), "w") as f:
                json.dump(history, f, indent=1)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "grpo_log.json"), "w") as f:
        json.dump(history, f, indent=1)
    k = max(len(history) // 10, 1)
    first = float(np.mean([h["mean_score"] for h in history[:k]]))
    last = float(np.mean([h["mean_score"] for h in history[-k:]]))
    print(f"\nmean sampled reward (first-10% vs last-10% of steps): "
          f"{first:.3f} -> {last:.3f}")
    print(f"probe acc: policy {history[-1].get('probe_acc_policy')}"
          f" vs frozen {history[-1].get('probe_acc_frozen')}")
    print(f"({(history[-1]['elapsed_s'] / len(history)):.2f}s/step)")


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="3b", choices=["tiny", "1b", "3b", "7b"])
    ap.add_argument("--quant", default="", choices=["", "int8", "int4"],
                    help="weight tier for the frozen base (7b needs int8 on one chip)")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--n-samples", type=int, default=256)
    ap.add_argument("--img-side", type=int, default=560)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="checkpoints/convergence")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--grpo", action="store_true",
                    help="GlimpsePrune+ RL convergence (VERDICT r3 #4)")
    ap.add_argument("--grpo-g", type=int, default=8)
    ap.add_argument("--grpo-new-tokens", type=int, default=1)
    ap.add_argument("--grpo-score", default="precision_match")
    ap.add_argument("--grpo-answers", default="lr", choices=["lr", "const"])
    ap.add_argument("--grpo-rank", type=int, default=4)
    ap.add_argument("--grpo-lr", type=float, default=3e-3)
    ap.add_argument("--grpo-base-every", type=int, default=1,
                    help="base loc/le step every N grpo steps (0=off)")
    ap.add_argument("--grpo-probe-every", type=int, default=25)
    args = ap.parse_args()

    if args.grpo:
        run_grpo(args)
        return

    import jax

    from glimpseprune_tpu.training.data import GPDataset
    from glimpseprune_tpu.training.trainer import GPTrainer, TrainerConfig

    data_root = args.data_root or os.path.join(args.out, "data")
    os.makedirs(data_root, exist_ok=True)
    config, img_dir = make_synth_corpus(data_root, args.n_samples, args.img_side)

    if args.scale == "tiny":
        from tools.demo import make_tiny

        cfg, params, tok = make_tiny()
        seq_mult, patch_mult = 8, 16
    else:
        import jax.numpy as jnp

        from bench import build_cfg
        from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
        from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs

        cfg = build_cfg(args.scale)
        seq_mult, patch_mult = 64, 256

        def tok(t):
            return [5 + (ord(c) % 2000) for c in t]

        # random-init frozen base (no checkpoint in this environment): the GP
        # modules still converge on the synthetic task — the ViT taps of a
        # frozen random tower carry the box position
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (args.img_side, args.img_side, 3), dtype=np.uint8)
        prompt = ([5, 6] + [cfg.vision_start_token_id, cfg.image_token_id,
                            cfg.vision_end_token_id] + [7, 8])
        prep = prepare_inputs(cfg, [prompt], [img], seq_multiple=seq_mult,
                              patch_multiple=patch_mult,
                              normed_bboxes=[[[0.2, 0.2, 0.5, 0.5]]],
                              answer_ids=[[9, 10]])
        model0 = Qwen2_5_VL_GP(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
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
        if args.quant:
            # int8 frozen base so 7B fits one 16 GB chip; the trainable GP
            # modules stay fp (outside quantization.DEFAULT_INCLUDE).
            # Init the REAL random weights on the host CPU and quantize
            # them — initializing under the quantized param declarations
            # would leave the int8 kernels at their zero placeholders (a
            # valid shape for timing benches, a degenerate base for
            # training)
            from glimpseprune_tpu.quantization import (
                quantize_int4,
                quantize_int8,
                quantized_config,
            )

            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                fp_params = jax.jit(model0.init, static_argnums=(16,))(
                    *jax.device_put(init_args[:-1], cpu), prep.out_len
                )["params"]
            qfn = quantize_int8 if args.quant == "int8" else quantize_int4
            params = jax.device_put(qfn(fp_params), jax.devices()[0])
            del fp_params
            cfg = quantized_config(cfg, args.quant)
        else:
            init_jit = jax.jit(model0.init, static_argnums=(16,))
            params = init_jit(*init_args)["params"]

    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP

    import jax.numpy as jnp

    dtype = jnp.float32 if args.scale == "tiny" else jnp.bfloat16
    model = Qwen2_5_VL_GP(cfg, dtype=dtype,
                          param_dtype=jnp.float32 if args.scale == "tiny" else jnp.bfloat16)

    def tokenize(t):
        return list(tok(t) if callable(tok) else tok.encode(t))

    dataset = GPDataset(config, img_dir=img_dir, tokenize=tokenize)
    print(f"dataset: {len(dataset)} synthetic samples, device={jax.devices()[0]}")

    tcfg = TrainerConfig(
        learning_rate=args.lr, batch_size=args.batch_size,
        num_epochs=max(1, args.steps * args.batch_size // max(len(dataset), 1) + 1),
        log_every=10, save_every=args.save_every, output_dir=args.out,
        seq_multiple=seq_mult, patch_multiple=patch_mult,
    )
    trainer = GPTrainer(cfg, model, params, dataset, tokenize, tcfg=tcfg,
                        resume_from=args.resume_from)
    history = trainer.train(max_steps=args.steps)

    print("\nstep   loss     loc     le      IoU    prec   recall")
    for h in history:
        if h["step"] % 50 == 0 or h["step"] == 1 or h is history[-1]:
            print(f"{h['step']:5d} {h['loss']:7.3f} {h['loc_loss']:7.3f} "
                  f"{h['le_loss']:7.3f} {h['mask_iou']:6.3f} "
                  f"{h['mask_precision']:6.3f} {h['mask_recall']:6.3f}")
    first, last = history[0], history[-1]
    print(f"\nloss {first['loss']:.3f} -> {last['loss']:.3f}; "
          f"IoU {first['mask_iou']:.3f} -> {last['mask_iou']:.3f} "
          f"in {last['step']} steps "
          f"({(last['elapsed_s'] / max(last['step'] - trainer._start_step, 1)):.2f}s/step)")


if __name__ == "__main__":
    main()
