#!/usr/bin/env python
"""Continuous-batching capacity/frontier ladder (VERDICT r3 #3).

Round 3 measured the continuous scheduler at 53% of the aggregated
protocol's throughput (159.7 tok/s at B=8 vs 302.9 at B=28) and left open
whether the gap is fundamental (admission prefills squeezed beside a
B-row decode cache) or just unexplored capacity. This ladder measures
tok/s + TTFT per point over

    B in {8, 12, 16} x kv in {int8, fp} x weights in {int8, int4}

by running `BENCH_MODE=continuous python bench.py` one point at a time
(one process on the chip at a time — CLAUDE.md timed-workload rule) and
appending rows to docs/serving_frontier.json. Reference protocol being
beaten: my_lmms_eval wall-clock do_generate (infer_cot.py:315-347).

Each bench run times BOTH sides (honesty rule); the unpruned side's B
stays at its own HBM cap (BENCH_SERVE_ROWS_U).

Usage:
  python tools/serving_frontier.py [--points 8x int8 int8,...] \
      [--out docs/serving_frontier.json] [--dry]
"""

import argparse
import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(B, kv, weights, n_dec, rows_u, timeout_s):
    env = dict(os.environ)
    env.update(
        BENCH_MODE="continuous",
        BENCH_SCALE="7b",
        BENCH_QUANT=weights,
        BENCH_KV_QUANT=kv if kv != "fp" else "none",
        BENCH_SERVE_ROWS_P=str(B),
        BENCH_SERVE_ROWS_U=str(rows_u),
        BENCH_DECODE=str(n_dec),
        # the unpruned side is independent of pruned B: measure it once per
        # (kv, weights) tier and reuse (its 16k batcher compile is ~13 min)
        BENCH_CONT_UNPRUNED_CACHE=f"/tmp/frontier_unpruned_{kv}_{weights}.json",
    )
    # int8 rides the measured W8A8 prefill tier; int4 rides the W4A8
    # prefill kernel where the per-shape routing policy measured it faster
    # (ROUND5.md §3) — both are the tiers bench.py ships by default
    env.setdefault("BENCH_ACT_QUANT", "prefill")
    t0 = time.time()
    # stream output to a per-point log (a timeout with capture_output
    # destroys all evidence of where the point's time went — learned r4)
    logp = f"/tmp/frontier_B{B}_{kv}_{weights}.log"
    with open(logp, "w") as lf:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, stdout=lf, stderr=subprocess.STDOUT, text=True,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            raise
    with open(logp) as lf:
        out_lines = lf.read().strip().splitlines()
    line = None
    for ln in reversed(out_lines):
        if ln.startswith("{"):
            line = ln
            break
    if proc.returncode != 0 or line is None:
        return {
            "B": B, "kv": kv, "weights": weights, "error": True,
            "rc": proc.returncode, "log": logp,
            "tail": "\n".join(out_lines[-12:]),
            "wall_s": round(time.time() - t0, 1),
        }
    d = json.loads(line)
    det = d.get("detail", {})
    # bench.py's continuous mode steps each side DOWN on OOM — record the B
    # actually served so a fallback can't masquerade as the requested point
    return {
        "B": B, "B_actual": det.get("pruned_batch"),
        "B_u_actual": det.get("unpruned_batch"), "kv": kv, "weights": weights,
        "tok_s": d["value"],
        "vs_unpruned": d["vs_baseline"],
        "ttft_mean_s": det.get("pruned_ttft", {}).get("mean_s"),
        "ttft_max_s": det.get("pruned_ttft", {}).get("max_s"),
        "unpruned_tok_s": det.get("unpruned_tok_s"),
        "unpruned_ttft_mean_s": det.get("unpruned_ttft", {}).get("mean_s"),
        "pruned_wall_s": det.get("pruned_wall_s"),
        "unpruned_reused": det.get("unpruned_reused"),
        "n_decode": det.get("n_decode"),
        "act_quant": det.get("act_quant"),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "serving_frontier.json"))
    ap.add_argument("--batches", default="8,12,16")
    ap.add_argument("--kv", default="int8,fp")
    ap.add_argument("--weights", default="int8,int4")
    ap.add_argument("--decode", type=int, default=1024)
    ap.add_argument("--rows-u", type=int, default=7,
                    help="unpruned side's own feasible batch (bench default)")
    ap.add_argument("--timeout", type=int, default=3600, help="per-point s")
    ap.add_argument("--points", default=None,
                    help="explicit ordered points 'B:kv:weights,...' "
                         "(overrides the --batches/--kv/--weights product)")
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    if args.points:
        points = []
        for spec in args.points.split(","):
            b, kv, w = spec.split(":")
            points.append((int(b), kv, w))
    else:
        points = list(itertools.product(
            [int(b) for b in args.batches.split(",")],
            args.kv.split(","),
            args.weights.split(","),
        ))
    if args.dry:
        for p in points:
            print(p)
        return

    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f).get("rows", [])
    done = {(r["B"], r["kv"], r["weights"]) for r in rows if not r.get("error")}

    for B, kv, w in points:
        if (B, kv, w) in done:
            print(f"skip (done): B={B} kv={kv} w={w}")
            continue
        print(f"running: B={B} kv={kv} weights={w} ...", flush=True)
        try:
            row = run_point(B, kv, w, args.decode, args.rows_u, args.timeout)
        except subprocess.TimeoutExpired:
            row = {"B": B, "kv": kv, "weights": w, "error": True,
                   "rc": "timeout", "wall_s": args.timeout}
        rows = [r for r in rows
                if not (r["B"] == B and r["kv"] == kv and r["weights"] == w)]
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "w") as f:
            json.dump({
                "protocol": "BENCH_MODE=continuous bench.py per point; both "
                            "sides timed; unpruned B fixed at its HBM cap",
                "n_decode": args.decode,
                "rows_u": args.rows_u,
                "rows": sorted(
                    rows, key=lambda r: (r["weights"], r["kv"], r["B"])),
            }, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
