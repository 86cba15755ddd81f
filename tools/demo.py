#!/usr/bin/env python
"""Interactive/one-shot GlimpsePrune demo (CLI version of reference demo_gp.py).

Loads a model (HF checkpoint dir via --hf-model, plus optional trained GP
new-modules via --new-modules; falls back to a random tiny model for smoke
runs), answers a question about an image, and shows the kept-token mask as
ASCII (and optionally a dimmed-overlay PNG).

Examples:
  python tools/demo.py --image cat.jpg --question "What is on the table?" \\
      --hf-model /path/Qwen2.5-VL-3B-Instruct --new-modules ckpt/gp \\
      --max-remain-ratio 0.111 --overlay out.png
  python tools/demo.py --image cat.jpg --question "hi" --tiny   # smoke test
"""

import argparse
import sys

import numpy as np


def load_hf_model(hf_dir, gp_overrides):
    import jax.numpy as jnp
    import torch
    from transformers import AutoConfig, AutoTokenizer, Qwen2_5_VLForConditionalGeneration

    from glimpseprune_tpu.models.qwen2_5_vl.convert import (
        convert_hf_state_dict,
        hf_config_to_model_config,
    )

    hf_cfg = AutoConfig.from_pretrained(hf_dir)
    cfg = hf_config_to_model_config(hf_cfg, **gp_overrides)
    model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        hf_dir, torch_dtype=torch.float32
    )
    params = convert_hf_state_dict(model.state_dict(), cfg)
    tok = AutoTokenizer.from_pretrained(hf_dir)
    return cfg, params, tok


def make_tiny():
    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.config import tiny_test_config
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    prompt = [1, cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id, 2]
    prep = prepare_inputs(cfg, [prompt], [img], seq_multiple=8, patch_multiple=16)
    model = Qwen2_5_VL_GP(cfg)
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

    class TinyTok:
        def __call__(self, text):
            return [5 + ord(c) % 400 for c in text[:32]]

        def encode(self, text):
            return self(text)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

    return cfg, variables["params"], TinyTok()


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--question", required=True)
    ap.add_argument("--hf-model", default=None)
    ap.add_argument("--new-modules", default=None)
    ap.add_argument("--tiny", action="store_true", help="random tiny model smoke run")
    ap.add_argument("--max-remain-ratio", type=float, default=0.111)
    ap.add_argument("--reduce-threshold", type=float, default=0.5)
    ap.add_argument("--no-selection", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--overlay", default=None, help="write dimmed-mask PNG here")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 serving (7B fits one 16GB chip)")
    ap.add_argument("--stream", action="store_true",
                    help="print tokens as they decode (reference demo_gp.py "
                    "TextIteratorStreamer); implies do_selection")
    ap.add_argument("--stream-chunk", type=int, default=4,
                    help="tokens per streamed increment (1 = per-token)")
    args = ap.parse_args()

    from PIL import Image

    from glimpseprune_tpu.models.qwen2_5_vl.runner import (
        GlimpsePruneRunner,
        prepare_inputs,
    )
    from glimpseprune_tpu.utils.viz import apply_mask_on_image, ascii_mask

    gp_overrides = dict(
        max_remain_ratio=args.max_remain_ratio,
        reduce_threshold=args.reduce_threshold,
    )
    if args.tiny or not args.hf_model:
        cfg, params, tok = make_tiny()
        cfg = cfg.replace_gp(**gp_overrides)
    else:
        cfg, params, tok = load_hf_model(args.hf_model, gp_overrides)
        if args.new_modules:
            from glimpseprune_tpu.persistence import load_new_modules

            params, loaded_cfg = load_new_modules(params, args.new_modules)
            cfg = loaded_cfg.replace_gp(**gp_overrides)

    if args.int8:
        from glimpseprune_tpu.quantization import quantize_int8, quantized_config

        params = quantize_int8(params)
        cfg = quantized_config(cfg)

    image = np.asarray(Image.open(args.image).convert("RGB"))
    prompt = (
        [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        + list(tok(args.question) if callable(tok) else tok.encode(args.question))
    )
    prep = prepare_inputs(cfg, [prompt], [image], seq_multiple=8, patch_multiple=16)
    runner = GlimpsePruneRunner(cfg, params)
    if args.stream:
        print(f"\nQ: {args.question}")
        print("A: ", end="", flush=True)
        gen = runner.stream_generate(
            prep, max_new_tokens=args.max_new_tokens,
            chunk_size=args.stream_chunk,
        )
        res = None
        emitted = 0
        while True:
            try:
                toks = next(gen)
            except StopIteration as stop:
                res = stop.value
                break
            piece = [int(x) for x in toks[0] if int(x) != cfg.eos_token_id]
            if piece:
                print(tok.decode(piece, skip_special_tokens=True),
                      end="", flush=True)
                emitted += len(piece)
            if len(piece) < toks.shape[1]:
                break
        # drain the generator to get the final result (mask, prune ratio)
        while res is None:
            try:
                next(gen)
            except StopIteration as stop:
                res = stop.value
        print()
    else:
        res = runner.generate(
            prep, max_new_tokens=args.max_new_tokens,
            do_selection=not args.no_selection,
        )
        answer = tok.decode(
            [int(x) for x in res.sequences[0, : res.num_generated[0]]],
            skip_special_tokens=True,
        )
        print(f"\nQ: {args.question}")
        print(f"A: {answer}")
    if res.keep_img is not None:
        gh = int(prep.grids[0][1] // cfg.vision.spatial_merge_size)
        gw = int(prep.grids[0][2] // cfg.vision.spatial_merge_size)
        mask = res.keep_img[0, : gh * gw].reshape(gh, gw)
        print(f"\npruned {res.prune_ratio[0]*100:.1f}% of {gh*gw} visual tokens; kept mask:")
        print(ascii_mask(mask))
        if args.overlay:
            Image.fromarray(apply_mask_on_image(image, mask)).save(args.overlay)
            print(f"overlay written to {args.overlay}")


if __name__ == "__main__":
    main()
