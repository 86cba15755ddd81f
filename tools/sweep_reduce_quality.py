#!/usr/bin/env python
"""Pair the reduce_layer latency sweep with a trained-fuser quality proxy.

VERDICT r3 #7: docs/sweep_reduce_layer.json measures the prefill ratio at
reduce_layer in {2,6,10,14,18} (of the 7B's 28 layers) but says nothing
about whether a fuser HARVESTING that early can still learn good masks
(the reference recipe trains at layer 18,
train_configs/qwen2_5_7b_gp/qwen2_5_7b_gp.yaml:43). This tool trains the
fuser at matched DEPTH FRACTIONS on an 8-layer tiny config (layer
round(rl/28*8): 2->1, 6->2, 10->3, 14->4, 18->5) over the synthetic-boxes
corpus and records the converged mask IoU next to each latency row as
`iou_tiny8_proxy`.

Proxy caveats (kept in the JSON): tiny-scale random frozen base, synthetic
boxes task — it probes "does an early harvest carry enough signal to train
the fuser", not the 7B GQA quality axis (unmeasurable here: no
checkpoints). CPU-friendly; run with JAX_PLATFORMS=cpu.

Usage:
  python tools/sweep_reduce_quality.py --steps 300 --out docs/sweep_reduce_layer.json
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tiny8_config(reduce_layer: int):
    from glimpseprune_tpu.config import tiny_test_config

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, num_hidden_layers=8)
    gp = dataclasses.replace(
        cfg.gp,
        selected_layers=(reduce_layer,),
        reduce_layer=reduce_layer,
        le_layers=tuple(range(8)),
    )
    return dataclasses.replace(cfg, text=text, gp=gp)


def train_one(reduce_layer: int, steps: int, lr: float, data_cfg, img_dir,
              seed: int = 0):
    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs
    from glimpseprune_tpu.training.data import GPDataset
    from glimpseprune_tpu.training.trainer import GPTrainer, TrainerConfig

    cfg = tiny8_config(reduce_layer)
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    prompt = [1, cfg.vision_start_token_id, cfg.image_token_id,
              cfg.vision_end_token_id, 2]
    prep = prepare_inputs(cfg, [prompt], [img], seq_multiple=8,
                          patch_multiple=16)
    model = Qwen2_5_VL_GP(cfg)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index),
        jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start), prep.out_len,
    )["params"]

    def tok(t):
        return [5 + ord(c) % 400 for c in t[:32]]

    dataset = GPDataset(data_cfg, img_dir=img_dir, tokenize=tok)
    tcfg = TrainerConfig(
        learning_rate=lr, batch_size=2, num_epochs=1000, log_every=10,
        save_every=0, output_dir="/tmp/sweep_quality_ckpt",
        seq_multiple=8, patch_multiple=16,
    )
    trainer = GPTrainer(cfg, model, params, dataset, tok, tcfg=tcfg)
    history = trainer.train(max_steps=steps)
    tail = [h for h in history if h["step"] > steps - 50]
    return {
        "tiny8_layer": reduce_layer,
        "iou_tiny8_proxy": round(float(np.mean([h["mask_iou"] for h in tail])), 4),
        "final_loss": round(float(np.mean([h["loss"] for h in tail])), 4),
        "first_loss": round(float(history[0]["loss"]), 4),
    }


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-samples", type=int, default=128)
    ap.add_argument("--out", default="docs/sweep_reduce_layer.json")
    ap.add_argument("--data-root", default="/tmp/sweep_quality_data")
    args = ap.parse_args()

    from tools.convergence_run import make_synth_corpus

    os.makedirs(args.data_root, exist_ok=True)
    data_cfg, img_dir = make_synth_corpus(args.data_root, args.n_samples, 96)

    with open(args.out) as f:
        sweep = json.load(f)

    n7 = 28  # the latency sweep ran on the 7B's 28 layers
    results = []
    for row in sweep["rows"]:
        rl7 = row["reduce_layer"]
        l8 = max(1, round(rl7 / n7 * 8))
        print(f"reduce_layer {rl7}/28 -> tiny8 layer {l8}/8: training "
              f"{args.steps} steps...", flush=True)
        r = train_one(l8, args.steps, args.lr, data_cfg, img_dir)
        row.update(r)
        results.append({**r, "reduce_layer_7b": rl7})
        print(f"  -> IoU {r['iou_tiny8_proxy']} "
              f"(loss {r['first_loss']} -> {r['final_loss']})", flush=True)

    sweep["iou_proxy_note"] = (
        "iou_tiny8_proxy: converged mask IoU of a fuser trained to harvest "
        "at the depth-fraction-matched layer of an 8-layer tiny config "
        "(synthetic-boxes corpus, random frozen base, %d steps) — a "
        "trainability probe for early harvests, NOT a 7B quality "
        "measurement (no checkpoints in this environment)." % args.steps
    )
    with open(args.out, "w") as f:
        json.dump(sweep, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
