"""Measured reduce_layer sweep: make the Amdahl ceiling empirical.

The reference 7B recipe pins reduce_layer=18 of 28
(train_configs/qwen2_5_7b_gp/qwen2_5_7b_gp.yaml:43) with an unpruned ViT,
which caps the prefill-only speedup at (V + 28L)/(V + 19L) regardless of
implementation. This sweep measures prefill/e2e ratios at several
reduce_layer points on the real chip (VERDICT r2 #4), showing what the
reference recipe forfeits and where a >=3x prefill ratio would actually be
reachable.

Protocol per point: bench.run (e2e mode) with BENCH_REDUCE_LAYER override,
identical tiers on both sides; the unpruned baseline is re-measured inside
every point (it does not depend on reduce_layer — agreement across points
doubles as a stability check).

Usage: python tools/sweep_reduce_layer.py [--layers 2,6,10,14,18]
       [--decode 128] [--out docs/sweep_reduce_layer.json]
Writes one JSON per point to stdout as it lands, plus the aggregate file.
"""

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", default="2,6,10,14,18")
    ap.add_argument("--decode", type=int, default=128)
    ap.add_argument("--scale", default="7b")
    ap.add_argument("--out", default="docs/sweep_reduce_layer.json")
    args = ap.parse_args()

    os.environ.setdefault("BENCH_QUANT", "int8")
    os.environ["BENCH_MODE"] = "e2e"
    os.environ["BENCH_DECODE"] = str(args.decode)

    import bench

    rows = []
    for rl in [int(x) for x in args.layers.split(",")]:
        os.environ["BENCH_REDUCE_LAYER"] = str(rl)
        r = bench.run(args.scale)
        row = {"reduce_layer": rl,
               "prefill_ratio": r["detail"]["prefill_ratio"],
               "e2e_ratio": r["detail"].get("e2e_ratio"),
               "prefill_pruned_ms": r["detail"]["prefill_pruned_ms"],
               "prefill_unpruned_ms": r["detail"]["prefill_unpruned_ms"],
               "e2e_generate_ms": r["detail"].get("e2e_generate_ms"),
               "n_image_tokens": r["detail"]["n_image_tokens"]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        gc.collect()

    out = {"scale": args.scale, "quant": os.environ.get("BENCH_QUANT"),
           "act_quant": os.environ.get("BENCH_ACT_QUANT", "none"),
           "decode": args.decode, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
