"""Validation against the REAL reference benchmark JSONs.

The reference ships its VisCoT benchmark data in-tree
(/root/reference/viscot_benchmark/benchmark/*.json). These tests push every
real row through `cot_bench_mapper` (the `path###[x1,y1,x2,y2]` bbox parse,
the prompt-sentence strip, the pixel->normalized conversion) and then run the
full inference harness end-to-end over the real gqa_debug.json rows with a
tiny model and synthetic stand-in images, producing the same jsonl/info.json
artifacts as the reference harness (infer_cot.py:223-287,350-373).
"""

import json
import os

import numpy as np
import pytest

from glimpseprune_tpu.evalsuite.data import cot_bench_mapper, load_benchmark

BENCH_DIR = "/root/reference/viscot_benchmark/benchmark"

requires_reference = pytest.mark.skipif(
    not os.path.isdir(BENCH_DIR), reason="reference benchmark data not present"
)

ALL_BENCHMARKS = [
    "cub", "docvqa", "dude", "emotic", "flickr30k", "gqa", "gqa_debug",
    "infographicsvqa", "openimages", "sroie", "textcap", "textvqa",
    "visual7w", "vsr",
]


@requires_reference
@pytest.mark.parametrize("name", ALL_BENCHMARKS)
def test_every_real_row_parses(name):
    path = os.path.join(BENCH_DIR, f"{name}.json")
    with open(path) as f:
        rows = json.load(f)
    assert rows, name
    # image files are not vendored; a fixed large image_size keeps the
    # normalized coords in [0, 1] for every dataset's pixel ranges
    size = (100000, 100000)
    n_degenerate = 0
    for one in rows:
        s = cot_bench_mapper(one, img_dir="/tmp/imgs", image_size=size)
        assert s.query and "<image>" not in s.query
        assert "bounding box coordinate" not in s.query
        assert s.query.endswith("Answer the question using a single word or phrase.")
        # real rows exist with empty gpt answers (e.g. dude qid 243)
        assert isinstance(s.answer, str)
        assert s.img_path.startswith("/tmp/imgs/")
        assert s.normed_bboxes is not None and len(s.normed_bboxes) == 1
        bbox = s.normed_bboxes[0]
        assert len(bbox) == 4 and all(np.isfinite(v) for v in bbox)
        assert all(-0.01 <= v <= 1.0 for v in bbox), (name, bbox)
        x1, y1, x2, y2 = bbox
        if not (0.0 <= x1 <= x2 <= 1.0 and 0.0 <= y1 <= y2 <= 1.0):
            # the real data contains a handful of reversed / slightly
            # negative boxes (docvqa, emotic); the mapper passes them
            # through unchanged like the reference's norm_bbox does
            n_degenerate += 1
    assert n_degenerate <= max(2, len(rows) // 50), (name, n_degenerate)


@requires_reference
def test_degenerate_real_boxes_rasterize_safely():
    """Reversed / negative real boxes must yield a valid (possibly empty)
    token mask, not crash or go out of bounds."""
    from glimpseprune_tpu.preprocessing.ref_masks import ref_token_mask_from_bboxes

    for bbox in ([0.00868, 0.00213, 0.00859, 0.00389],   # docvqa reversed x
                 [-1e-05, 0.0001, 0.00287, 0.00336]):    # emotic negative x1
        m = ref_token_mask_from_bboxes([bbox], (24, 36))
        assert m.shape == (24, 36) and m.dtype == bool


@requires_reference
def test_real_bbox_pixel_ranges_sane():
    """The ###[bbox] pixel coords must be plausibly within image bounds —
    guard against parse transpositions (x/y swap would show y2 > typical
    widths for portrait document sets)."""
    import ast

    for name in ("gqa", "docvqa", "sroie"):
        with open(os.path.join(BENCH_DIR, f"{name}.json")) as f:
            rows = json.load(f)
        n_rev = 0
        for one in rows:
            raw = one["image"][1].split("###")[1]
            bbox = ast.literal_eval(raw)
            assert len(bbox) == 4
            assert all(isinstance(v, (int, float)) for v in bbox)
            n_rev += int(not (bbox[2] >= bbox[0] and bbox[3] >= bbox[1]))
        # a few real rows carry reversed boxes (annotation noise); a
        # transposed parse would flip far more than 2%
        assert n_rev <= len(rows) // 50, (name, n_rev)


@requires_reference
def test_infer_harness_on_real_gqa_debug(tmp_path):
    """End-to-end: real gqa_debug.json rows -> glimpse + generate artifacts
    with a tiny model and deterministic synthetic images."""
    import jax
    import jax.numpy as jnp

    import test_gp_pipeline as g
    from glimpseprune_tpu.config import tiny_test_config
    from glimpseprune_tpu.evalsuite.infer import InferenceConfig, run_inference
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import (
        GlimpsePruneRunner,
        prepare_inputs,
    )

    cfg = tiny_test_config()
    samples = load_benchmark(
        os.path.join(BENCH_DIR, "gqa_debug.json"),
        img_dir="/tmp/imgs", mapper="cot_bench", image_size=(640, 480),
    )
    assert len(samples) == 6

    def load_image(path):
        rng = np.random.default_rng(abs(hash(path)) % 2**32)
        return rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)

    def tokenize(t):
        return [5 + (ord(c) % 200) for c in t[:32]]

    def detokenize(ids):
        return "".join(chr(97 + (i % 26)) for i in ids)

    rng = np.random.default_rng(0)
    prompts = g.make_prompts(cfg, rng)
    init_images = [g.make_image(rng, 64, 96), g.make_image(rng, 56, 56)]
    prep0 = prepare_inputs(cfg, prompts, init_images, seq_multiple=8, patch_multiple=16)
    model = Qwen2_5_VL_GP(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prep0.input_ids), jnp.asarray(prep0.valid),
        jnp.asarray(prep0.position_ids), jnp.asarray(prep0.patches),
        jnp.asarray(prep0.vis_pos_ids), jnp.asarray(prep0.full_seg),
        jnp.asarray(prep0.vis_valid), jnp.asarray(prep0.packed_idx),
        jnp.asarray(prep0.img_slots), jnp.asarray(prep0.img_valid),
        jnp.asarray(prep0.fuser.window_index), jnp.asarray(prep0.fuser.reverse_index),
        jnp.asarray(prep0.fuser.segment_ids), jnp.asarray(prep0.fuser.pos_ids),
        jnp.asarray(prep0.le_start), prep0.out_len,
    )
    runner = GlimpsePruneRunner(cfg, variables["params"])

    # glimpse task: mask metrics vs the real rows' bbox ground truth
    p1 = run_inference(
        runner, samples, str(tmp_path), "gqa_debug",
        InferenceConfig(task="glimpse", batch_size=2),
        tokenize, detokenize, load_image=load_image,
    )
    recs = [json.loads(l) for l in open(p1)]
    assert len(recs) == 6
    assert all("iou" in r and 0.0 <= r["iou"] <= 1.0 for r in recs)
    assert all(r["mask_ratio"] > 0 for r in recs)
    info = json.load(open(str(tmp_path) + "/gqa_debug_glimpse_info.json"))
    assert info["num_samples"] == 6 and info["mean_iou"] is not None

    # generate task: responses + token counts from the same real rows
    p2 = run_inference(
        runner, samples, str(tmp_path), "gqa_debug",
        InferenceConfig(task="generate", batch_size=2, max_new_tokens=4),
        tokenize, detokenize, load_image=load_image,
    )
    recs = [json.loads(l) for l in open(p2)]
    assert all(isinstance(r["response"], str) for r in recs)
    assert all(r["num_gen_tokens"] >= 1 for r in recs)
    # resume: second call skips (same path returned, file unchanged)
    mtime = os.path.getmtime(p2)
    assert run_inference(
        runner, samples, str(tmp_path), "gqa_debug",
        InferenceConfig(task="generate", batch_size=2, max_new_tokens=4),
        tokenize, detokenize, load_image=load_image,
    ) == p2
    assert os.path.getmtime(p2) == mtime
