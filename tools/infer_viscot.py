#!/usr/bin/env python
"""Free-form VisCoT inference CLI (reference viscot_eval/infer_cot.py).

Runs generate/glimpse over benchmark JSONs with a GP (or baseline-compressed)
model, writing <dataset>_<task>.jsonl + info artifacts with mask metrics.
Multi-host: pass --host-id/--num-hosts for contiguous data sharding.

Example:
  python tools/infer_viscot.py --benchmark viscot_benchmark/benchmark/gqa.json \\
      --img-dir /data/images --hf-model /path/Qwen2.5-VL-3B-Instruct \\
      --new-modules ckpt/gp --task generate --max-remain-ratio 0.111 \\
      --out-dir results/gqa
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import os


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", required=True, help="VisCoT benchmark json")
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--dataset-name", default=None)
    ap.add_argument("--mapper", default="cot_bench")
    ap.add_argument("--hf-model", default=None)
    ap.add_argument("--new-modules", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--task", default="generate", choices=["generate", "glimpse"])
    ap.add_argument("--compressor", default=None,
                    help="baseline method instead of GP (visionzip/divprune/...)")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=1024)
    ap.add_argument("--max-remain-ratio", type=float, default=None)
    ap.add_argument("--min-remain-num", type=int, default=None)
    ap.add_argument("--reduce-layer", type=int, default=None)
    ap.add_argument("--use-ref-masks", action="store_true")
    ap.add_argument("--no-selection", action="store_true")
    ap.add_argument("--no-brief", action="store_true")
    ap.add_argument("--num-samples", type=int, default=None)
    ap.add_argument("--save-masks", action="store_true")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    from glimpseprune_tpu.evalsuite import (
        InferenceConfig,
        load_benchmark,
        run_inference,
        shard_for_host,
    )
    from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner

    from tools.demo import load_hf_model, make_tiny  # shared loaders

    gp_overrides = {}
    for k, v in (
        ("max_remain_ratio", args.max_remain_ratio),
        ("min_remain_num", args.min_remain_num),
        ("reduce_layer", args.reduce_layer),
    ):
        if v is not None:
            gp_overrides[k] = v

    if args.tiny or not args.hf_model:
        cfg, params, tok = make_tiny()
        if gp_overrides:
            cfg = cfg.replace_gp(**gp_overrides)
    else:
        cfg, params, tok = load_hf_model(args.hf_model, {})
        if args.new_modules:
            from glimpseprune_tpu.persistence import load_new_modules

            params, cfg = load_new_modules(params, args.new_modules)
        if gp_overrides:
            cfg = cfg.replace_gp(**gp_overrides)

    runner = GlimpsePruneRunner(cfg, params)
    name = args.dataset_name or os.path.splitext(os.path.basename(args.benchmark))[0]
    samples = load_benchmark(
        args.benchmark, args.img_dir, mapper=args.mapper,
        brief=not args.no_brief, num_samples=args.num_samples,
    )
    samples = shard_for_host(samples, args.host_id, args.num_hosts)
    icfg = InferenceConfig(
        task=args.task,
        batch_size=args.batch_size,
        max_new_tokens=args.max_new_tokens,
        use_ref_masks=args.use_ref_masks,
        do_selection=not args.no_selection,
        brief=not args.no_brief,
        save_masks=args.save_masks,
        compressor=args.compressor,
    )

    def tokenize(t):
        return list(tok(t) if callable(tok) else tok.encode(t))

    def detokenize(ids):
        return tok.decode(ids, skip_special_tokens=True)

    if args.num_hosts > 1:
        name = f"{name}_shard{args.host_id}"
    out = run_inference(
        runner, samples, args.out_dir, name, icfg,
        tokenize=tokenize, detokenize=detokenize, overwrite=args.overwrite,
    )
    print(out)


if __name__ == "__main__":
    main()
