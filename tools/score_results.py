#!/usr/bin/env python
"""Score eval result jsonls (reference viscot_eval/cal_cot_score.py).

Offline scorers run locally; --judge-url enables the LLM judge over any
OpenAI-compatible endpoint (vLLM etc.). Line-level resume by default.

Example:
  python tools/score_results.py results/gqa/gqa_generate.jsonl --scorer llm \\
      --judge-url http://localhost:8000/v1 --judge-model Qwen2.5-32B-Instruct
"""

import argparse
import json


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("results", nargs="+")
    ap.add_argument("--scorer", default="precise_match")
    ap.add_argument("--judge-url", default=None)
    ap.add_argument("--judge-model", default="judge")
    ap.add_argument("--judge-api-key", default="EMPTY")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    from glimpseprune_tpu.evalsuite import LLMClient, score_results

    client = None
    if args.judge_url:
        client = LLMClient(args.judge_url, args.judge_api_key, args.judge_model)

    for path in args.results:
        summary = score_results(
            path, scorer=args.scorer, batch_size=args.batch_size,
            client=client, overwrite=args.overwrite,
        )
        print(json.dumps({"file": path, **summary}))


if __name__ == "__main__":
    main()
