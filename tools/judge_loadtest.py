#!/usr/bin/env python
"""Throughput/latency load test for the LLM-judge endpoint
(reference test_api.py:17-60, threaded)."""

import argparse
import json
import statistics
import threading
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--judge-url", required=True)
    ap.add_argument("--judge-model", default="judge")
    ap.add_argument("--api-key", default="EMPTY")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--requests-per-thread", type=int, default=4)
    args = ap.parse_args()

    from glimpseprune_tpu.evalsuite.judge import LLMClient

    client = LLMClient(args.judge_url, args.api_key, args.judge_model)
    latencies, errors = [], [0]
    lock = threading.Lock()

    def worker(tid):
        for i in range(args.requests_per_thread):
            t0 = time.perf_counter()
            try:
                scores = client.score(
                    [f"What color is object {tid}-{i}?"], ["it is blue"], ["blue"]
                )
                ok = 0.0 <= scores[0] <= 1.0
            except Exception:
                ok = False
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)
                if not ok:
                    errors[0] += 1

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(t,)) for t in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    n = len(latencies)
    print(json.dumps({
        "requests": n,
        "errors": errors[0],
        "wall_s": round(wall, 2),
        "throughput_rps": round(n / wall, 2),
        "latency_p50_s": round(statistics.median(latencies), 3) if latencies else None,
        "latency_max_s": round(max(latencies), 3) if latencies else None,
    }))


if __name__ == "__main__":
    main()
