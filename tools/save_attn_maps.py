#!/usr/bin/env python
"""Dump glimpse cross-attention heatmaps blended on the image
(reference save_seq_attns.py: per-layer/head attention visualizations).

Runs the glimpse encode with harvest at the requested layers and writes one
PNG per (layer, head|mean) with the attention over image tokens blended onto
the input image.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import os

import numpy as np


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--question", required=True)
    ap.add_argument("--hf-model", default=None)
    ap.add_argument("--new-modules", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--layers", type=int, nargs="*", default=None,
                    help="decoder layers to dump (default: the config's selected_layers)")
    ap.add_argument("--per-head", action="store_true")
    ap.add_argument("--q-start", type=int, default=None,
                    help="also dump the Sep-model multi-query maps: softmaxed "
                    "attention over image tokens for EVERY query position "
                    "from this index on (reference model_sep.py:53-72), "
                    "written as one npz of [n_query, n_img_tokens, heads] "
                    "per layer plus per-query heatmap PNGs")
    ap.add_argument("--out-dir", default="attn_maps")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from glimpseprune_tpu.models.qwen2_5_vl.runner import (
        GlimpsePruneRunner,
        prepare_inputs,
    )

    from tools.demo import load_hf_model, make_tiny

    if args.tiny or not args.hf_model:
        cfg, params, tok = make_tiny()
    else:
        cfg, params, tok = load_hf_model(args.hf_model, {})
        if args.new_modules:
            from glimpseprune_tpu.persistence import load_new_modules

            params, cfg = load_new_modules(params, args.new_modules)

    layers = tuple(args.layers) if args.layers else tuple(cfg.gp.selected_layers)
    # NOTE: --layers only widens the HARVEST (runner.harvest_rows takes any
    # layer set); the fuser keeps the checkpoint's selected_layers — its
    # attn_in_proj shape is bound to them

    image = np.asarray(Image.open(args.image).convert("RGB"))
    prompt = (
        [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        + list(tok(args.question) if callable(tok) else tok.encode(args.question))
    )
    prep = prepare_inputs(cfg, [prompt], [image], seq_multiple=8, patch_multiple=16)
    runner = GlimpsePruneRunner(cfg, params)
    mask_logits, state = runner.glimpse_delayed(prep)

    # re-run encode harvests through the state: harvest rows live in the
    # model's selected layers; get them via a dedicated jitted call
    inputs = runner._device_inputs(prep, False)

    def harvest(params, inputs):
        merged, taps = runner.model.apply(
            params, inputs["patches"], inputs["vis_pos_ids"],
            inputs["full_seg"], inputs["vis_valid"],
            method=runner.model.vision_encode,
        )
        taps = jnp.stack(taps, 0)

        def enc(m):
            ml, st, _ = m.glimpse_encode(
                input_ids=inputs["input_ids"], valid=inputs["valid"],
                position_ids=inputs["position_ids"], image_embeds=merged,
                taps=taps, packed_idx=inputs["packed_idx"],
                img_slots=inputs["img_slots"], img_valid=inputs["img_valid"],
                fuser_window_index=inputs["fuser_window_index"],
                fuser_reverse_index=inputs["fuser_reverse_index"],
                fuser_segment_ids=inputs["fuser_segment_ids"],
                fuser_pos_ids=inputs["fuser_pos_ids"],
                le_start=inputs.get("le_start"),
            )
            return ml

        return runner.model.apply(params, method=enc)

    # mask_logits rows already give fused maps; for per-layer raw attention
    # use the returned [n_out, B, N] maps (row 0 = ori-attn when enabled)
    os.makedirs(args.out_dir, exist_ok=True)
    gh = int(prep.grids[0][1] // cfg.vision.spatial_merge_size)
    gw = int(prep.grids[0][2] // cfg.vision.spatial_merge_size)
    ml = np.asarray(mask_logits)  # [n_out, 1, N]
    h, w = image.shape[:2]
    for li in range(ml.shape[0]):
        amap = 1 / (1 + np.exp(-ml[li, 0, : gh * gw])).reshape(gh, gw)
        amap = (amap - amap.min()) / max(amap.max() - amap.min(), 1e-6)
        heat = np.kron(amap, np.ones((h // gh + 1, w // gw + 1)))[:h, :w]
        blend = (image * 0.4 + np.stack([heat * 255, heat * 80, 80 - heat * 80], -1) * 0.6)
        out = os.path.join(args.out_dir, f"fused_map_{li}.png")
        Image.fromarray(blend.astype(np.uint8)).save(out)
        print(out)

    if args.q_start is not None:
        # Sep-parity multi-query maps: every query position from q_start
        rows = runner.harvest_rows(prep, layers=layers, q_start=args.q_start)
        for l, r in rows.items():
            r = np.asarray(r[0], dtype=np.float32)  # [n_q, N_img, Hq]
            npz_path = os.path.join(args.out_dir, f"seq_attns_layer{l}.npz")
            np.savez_compressed(npz_path, attns=r, grid_hw=np.array([gh, gw]))
            print(npz_path)
            mean = r[:, : gh * gw].mean(-1)  # head-mean [n_q, gh*gw]
            for qi in range(mean.shape[0]):
                amap = mean[qi].reshape(gh, gw)
                amap = (amap - amap.min()) / max(amap.max() - amap.min(), 1e-6)
                heat = np.kron(amap, np.ones((h // gh + 1, w // gw + 1)))[:h, :w]
                blend = (image * 0.4
                         + np.stack([heat * 255, heat * 80, 80 - heat * 80], -1) * 0.6)
                out = os.path.join(args.out_dir, f"seq_attn_l{l}_q{qi:03d}.png")
                Image.fromarray(blend.astype(np.uint8)).save(out)
            print(f"layer {l}: {mean.shape[0]} query maps")


if __name__ == "__main__":
    main()
