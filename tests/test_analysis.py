"""FLOPs accounting + oracle retention sanity."""

import json

import numpy as np

from glimpseprune_tpu.analysis import (
    flops_report_from_results,
    gp_pipeline_flops,
    oracle_retention,
    vanilla_pipeline_flops,
)
from glimpseprune_tpu.config import qwen2_5_vl_7b, tiny_test_config
from glimpseprune_tpu.evalsuite.data import EvalSample


def test_gp_flops_below_vanilla_at_92_percent_pruning():
    cfg = qwen2_5_vl_7b().replace_gp(reduce_layer=18, selected_layers=(18,))
    van = vanilla_pipeline_flops(cfg, n_text=64, n_img=1280, n_decode=128)
    gp = gp_pipeline_flops(cfg, n_text=64, n_img=1280, n_keep=102, n_decode=128)
    assert gp["total"] < van["total"]
    assert gp["prefill"] < van["prefill"]
    # decode over the compacted cache is strictly cheaper
    assert gp["decode"] < van["decode"]
    # reduction should be substantial at 92% pruning with reduce at 18/28
    assert 1 - gp["total"] / van["total"] > 0.15


def test_flops_report_from_results(tmp_path):
    rows = [
        {"num_gen_tokens": 10, "mask_ratio": 0.08, "token_grid": [20, 30]},
        {"num_gen_tokens": 20, "mask_ratio": 0.10, "token_grid": [10, 12]},
    ]
    p = tmp_path / "r.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    rep = flops_report_from_results(
        str(p), qwen2_5_vl_7b().replace_gp(reduce_layer=18, selected_layers=(18,))
    )
    assert rep["num_samples"] == 2
    assert 0 < rep["flops_reduction"] < 1
    assert rep["avg_gp_tflops"] < rep["avg_vanilla_tflops"]


def test_oracle_retention():
    cfg = tiny_test_config()
    samples = [
        EvalSample(0, "q", "x.jpg", normed_bboxes=[[0.0, 0.0, 0.5, 0.5]]),
        EvalSample(1, "q", "y.jpg", normed_bboxes=[[0.0, 0.0, 1.0, 1.0]]),
        EvalSample(2, "q", "z.jpg", normed_bboxes=None),
    ]
    rep = oracle_retention(samples, cfg, image_sizes=[(224, 224), (112, 112), (10, 10)])
    assert rep["num_samples"] == 2
    assert 0.25 < rep["avg_retention"] < 0.7  # box covers ~25% + full image avg
