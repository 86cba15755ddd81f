"""Eval harness: data loading, end-to-end inference artifacts, scorers."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.evalsuite import (
    InferenceConfig,
    load_benchmark,
    run_inference,
    score_results,
    shard_for_host,
)
from glimpseprune_tpu.evalsuite.judge import extract_score
from glimpseprune_tpu.evalsuite.scorers import (
    extract_one_bbox_from_str,
    one_box_iou05,
    single_choice,
)
from glimpseprune_tpu.evalsuite.shortform import (
    exact_match_accuracy,
    score_shortform,
    yes_no_metrics,
)
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner


def make_benchmark(tmp_path, n=4):
    """Synthesize a VisCoT-format benchmark + images on disk."""
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    os.makedirs(img_dir / "cot", exist_ok=True)
    data = []
    from PIL import Image

    for i in range(n):
        name = f"cot/{i}.jpg"
        arr = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        data.append(
            {
                "dataset": "toy",
                "question_id": i,
                "image": [name, f"{name}###[10, 10, 40, 40]"],
                "conversations": [
                    {"from": "human", "value": f"<image>\nWhat is object {i}?"},
                    {"from": "gpt", "value": "[0.1, 0.1, 0.4, 0.4]"},
                    {"from": "human", "value": "<image>"},
                    {"from": "gpt", "value": f"thing{i}"},
                ],
            }
        )
    json_path = tmp_path / "toy.json"
    with open(json_path, "w") as f:
        json.dump(data, f)
    return str(json_path), str(img_dir)


def test_load_benchmark_and_shard(tmp_path):
    json_path, img_dir = make_benchmark(tmp_path)
    samples = load_benchmark(json_path, img_dir, mapper="cot_bench")
    assert len(samples) == 4
    s = samples[0]
    assert "What is object 0?" in s.query and "single word" in s.query
    assert s.answer == "thing0"
    assert s.normed_bboxes is not None
    np.testing.assert_allclose(s.normed_bboxes[0], [10 / 96, 10 / 64, 40 / 96, 40 / 64])

    shards = [shard_for_host(samples, h, 3) for h in range(3)]
    assert sum(len(x) for x in shards) == 4
    assert [s.sample_id for sh in shards for s in sh] == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def runner():
    import test_gp_pipeline as g

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prompts = g.make_prompts(cfg, rng)
    images = [g.make_image(rng, 64, 96), g.make_image(rng, 56, 56)]
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs

    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
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
    return GlimpsePruneRunner(cfg, variables["params"])


def fake_tokenize(text):
    return [5 + (ord(c) % 200) for c in text[:12]]


def fake_detokenize(ids):
    return " ".join(str(i) for i in ids)


def test_run_inference_generate_and_resume(tmp_path, runner):
    json_path, img_dir = make_benchmark(tmp_path)
    samples = load_benchmark(json_path, img_dir)
    cfg = InferenceConfig(task="generate", max_new_tokens=4, batch_size=2, save_masks=True)
    out = run_inference(
        runner, samples, str(tmp_path / "out"), "toy", cfg,
        tokenize=fake_tokenize, detokenize=fake_detokenize,
    )
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 4
    assert all(r["response"] is not None for r in rows)
    assert all("iou" in r for r in rows)  # bbox metrics present
    assert all("keep_mask" in r for r in rows)
    info = json.load(open(out.replace(".jsonl", "_info.json")))
    assert info["num_samples"] == 4 and info["mean_iou"] is not None
    assert "time_ms" in info["logger_stats"]

    # resume: second call returns without rewriting
    mtime = os.path.getmtime(out)
    out2 = run_inference(
        runner, samples, str(tmp_path / "out"), "toy", cfg,
        tokenize=fake_tokenize, detokenize=fake_detokenize,
    )
    assert out2 == out and os.path.getmtime(out) == mtime


def test_run_inference_glimpse_task(tmp_path, runner):
    json_path, img_dir = make_benchmark(tmp_path)
    samples = load_benchmark(json_path, img_dir)
    cfg = InferenceConfig(task="glimpse", batch_size=2)
    out = run_inference(
        runner, samples, str(tmp_path / "outg"), "toy", cfg,
        tokenize=fake_tokenize, detokenize=fake_detokenize,
    )
    rows = [json.loads(l) for l in open(out)]
    assert all(r["response"] is None for r in rows)
    assert all(0 <= r["mask_ratio"] <= 1 for r in rows)


def test_score_results_offline_and_resume(tmp_path, runner):
    json_path, img_dir = make_benchmark(tmp_path)
    samples = load_benchmark(json_path, img_dir)
    cfg = InferenceConfig(task="generate", max_new_tokens=4, batch_size=2)
    out = run_inference(
        runner, samples, str(tmp_path / "outs"), "toy", cfg,
        tokenize=fake_tokenize, detokenize=fake_detokenize,
    )
    summary = score_results(out, scorer="precise_match")
    assert summary["num_scored"] == 4
    assert 0.0 <= summary["mean_score"] <= 1.0
    # resume does not rescore
    summary2 = score_results(out, scorer="dummy_score")
    assert summary2["mean_score"] == summary["mean_score"]


def test_offline_scorers():
    assert single_choice(["q"], ["B"], ["The answer is B."]) == [1.0]
    assert single_choice(["q"], ["B"], ["(C)"]) == [0.0]
    # integer pixel boxes only — the reference evaluator's exact pattern
    # (utils.py:45-57); float/normalized boxes fall back to zeros
    assert extract_one_bbox_from_str("box: [10, 20, 50, 60] end") == [10, 20, 50, 60]
    assert extract_one_bbox_from_str("box: [0.1, 0.2, 0.5, 0.6] end") == [0, 0, 0, 0]
    assert one_box_iou05(["q"], [[10, 10, 50, 50]], ["[10, 10, 50, 50]"]) == [1.0]
    assert one_box_iou05(["q"], [[10, 10, 50, 50]], ["[60, 60, 90, 90]"]) == [0.0]
    # the GT side is raw lists / list-strings (VisCoT normalized floats) and
    # NEVER goes through the int-only prediction extractor
    # (cal_cot_score.py:399-405); jsonl round-trips hand it back as a string
    assert one_box_iou05(["q"], ["[0.2, 0.2, 0.6, 0.6]"],
                         ["pred [0, 0, 1, 1]"]) == [0.0]
    gt_str = "[10.0, 10.0, 50.0, 50.0]"
    assert one_box_iou05(["q"], [gt_str], ["[10, 10, 50, 50]"]) == [1.0]
    # malformed/scalar/wrong-arity gt never raises
    assert one_box_iou05(["q", "q", "q"], ["5", "[1, 2]", "junk"],
                         ["[1,2,3,4]"] * 3) == [0.0, 0.0, 0.0]
    assert extract_score("blah score: 0.75") == 0.75
    assert extract_score("no score here") == 0.0
    assert extract_score("score: 1.5") == 1.0


def test_shortform_metrics():
    assert exact_match_accuracy(["The Cat.", "dog"], ["cat", "bird"]) == 0.5
    m = yes_no_metrics(["Yes", "no", "yes"], ["yes", "yes", "no"])
    assert m["accuracy"] == pytest.approx(1 / 3)
    assert score_shortform("mmbench", ["Answer: C"], ["C"]) == 1.0
    with pytest.raises(KeyError):
        score_shortform("nope", [], [])


def test_run_inference_with_compressor(tmp_path, runner):
    json_path, img_dir = make_benchmark(tmp_path)
    samples = load_benchmark(json_path, img_dir)
    cfg = InferenceConfig(
        task="generate", max_new_tokens=4, batch_size=2,
        compressor="divprune", compressor_kwargs={"visual_token_num": 2},
    )
    out = run_inference(
        runner, samples, str(tmp_path / "outc"), "toy", cfg,
        tokenize=fake_tokenize, detokenize=fake_detokenize,
    )
    rows = [json.loads(l) for l in open(out)]
    assert all(r["response"] is not None for r in rows)
    # 64x96 toy images -> 6 merged tokens; divprune keeps 2
    assert all(abs(r["mask_ratio"] - 2 / 6) < 1e-6 for r in rows)


def test_gather_objects_single_host_and_merge(tmp_path):
    from glimpseprune_tpu.utils.multihost import gather_objects, merge_host_results

    assert gather_objects({"a": 1}) == [{"a": 1}]
    p1, p2 = tmp_path / "s0.jsonl", tmp_path / "s1.jsonl"
    p1.write_text('{"question_id": 1, "x": "a"}\n{"question_id": 2, "x": "b"}\n')
    p2.write_text('{"question_id": 2, "x": "b"}\n{"question_id": 3, "x": "c"}\n')
    out = tmp_path / "merged.jsonl"
    n = merge_host_results([str(p1), str(p2)], str(out))
    assert n == 3
    rows = [json.loads(l) for l in open(out)]
    assert [r["question_id"] for r in rows] == [1, 2, 3]


def test_llm_client_concurrent_scoring_order_and_speedup():
    """score() fans out over threads: with a 50ms-per-request local judge,
    16 requests complete ~concurrency x faster than serial, and scores come
    back in input order (reference test_api.py:17-60 proves the endpoint
    side handles concurrency)."""
    import http.server
    import socketserver
    import threading
    import time as _time

    from glimpseprune_tpu.evalsuite.judge import LLMClient

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            # echo the per-item score encoded in the completion text
            user = body["messages"][1]["content"]
            import re as _re

            m = _re.search(r"model's answer: s(\d+)", user)
            val = int(m.group(1)) / 100.0 if m else 0.0
            _time.sleep(0.05)
            resp = json.dumps({
                "choices": [{"message": {"content": f"score: {val}"}}]
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    with socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            client = LLMClient(f"http://127.0.0.1:{port}", concurrency=16)
            client.score(["warm"], ["s0"], ["a"])  # one-time urllib/opener init
            n = 16
            queries = [f"q{i}" for i in range(n)]
            comps = [f"s{i}" for i in range(n)]
            answers = ["a"] * n
            t0 = _time.perf_counter()
            scores = client.score(queries, comps, answers)
            elapsed = _time.perf_counter() - t0
            assert scores == [i / 100.0 for i in range(n)]  # input order kept
            # concurrency check: comfortably faster than SERIAL (n*50ms).
            # >2x is loose on purpose — the suite runs alongside other
            # jobs and a 4x bar flaked under full-machine load
            assert elapsed < n * 0.05 / 2
            # serial fallback path still works
            client1 = LLMClient(f"http://127.0.0.1:{port}", concurrency=1)
            assert client1.score(["q"], ["s7"], ["a"]) == [0.07]
        finally:
            srv.shutdown()


def test_bbox_utils_match_reference_executable():
    """Fuzz extract_one_bbox_from_str / paired IoU against the reference's
    own utils.py (imported with its openai dependency stubbed), including
    the no-match and malformed-string fallbacks."""
    import numpy as np

    pytest.importorskip("torch")
    from reference_shim import load_reference_utils

    ref = load_reference_utils()

    from glimpseprune_tpu.evalsuite.scorers import (
        extract_one_bbox_from_str,
        paired_box_iou,
    )

    cases = [
        "The answer is [12, 34, 56, 78].",
        "[1,2,3,4]",
        "[ 5, 6 , 7, 8 ] trailing",
        "two boxes [1, 2, 3, 4] and [9, 8, 7, 6]",  # first match wins
        "no box here",
        "[1.5, 2, 3, 4]",            # floats don't match the int pattern
        "[-1, 2, 3, 4]",             # negative doesn't match
        "[01, 002, 3, 4]",
        "",
    ]
    rng = np.random.default_rng(0)
    for _ in range(40):
        a, b, c, d = rng.integers(0, 999, 4)
        cases.append(f"bbox: [{a}, {b}, {c}, {d}]!")
    for s in cases:
        assert extract_one_bbox_from_str(s) == ref.extract_one_bbox_from_str(s), s

    boxes1 = rng.uniform(0, 100, (64, 4))
    boxes2 = rng.uniform(0, 100, (64, 4))
    # include degenerate/inverted boxes — the reference does not sort corners
    boxes1[:8] = boxes1[:8][:, [2, 3, 0, 1]]
    boxes2[4:12, 2:] = boxes2[4:12, :2]
    np.testing.assert_allclose(
        paired_box_iou(boxes1, boxes2), ref.cal_paired_ious(boxes1, boxes2),
        rtol=1e-12)


def test_judge_score_parse_matches_reference_executable():
    """extract_score vs the reference LLMClient._extract_score_from_str
    (utils.py:126-139), executed directly (the method reads no state)."""
    pytest.importorskip("torch")
    from reference_shim import load_reference_utils

    parse = load_reference_utils().LLMClient._extract_score_from_str

    from glimpseprune_tpu.evalsuite.judge import extract_score

    cases = [
        "score: 0.75", "Score: 1.0", "SCORE: 0.3 extra", "score:0.5",
        "the score is good", "score: 2.5", "score: .5", "score: 0.5 score: 0.7",
        "no mention", "score: 1", "prefix\nscore: 0.25\nsuffix", "score: 0..5",
    ]

    def outcome(fn, s):
        # both callers catch parse errors and score 0.0 (utils.py:158-161 /
        # judge._score_one) — behaviors must match incl. the raising cases
        try:
            return ("ok", fn(s))
        except ValueError:
            return ("raise", None)

    for s in cases:
        assert outcome(extract_score, s) == outcome(lambda t: parse(None, t), s), s


def test_mask_confusion_matches_reference_cal_box_metrics():
    """mask_confusion_stats vs the reference's executable cal_box_metrics
    (viscot_eval/infer_cot.py:350-373) on random masks incl. the all-empty
    IoU fallback."""
    torch = pytest.importorskip("torch")
    from reference_shim import load_reference_infer_cot

    ref = load_reference_infer_cot()

    from glimpseprune_tpu.training.train_step import mask_confusion_stats  # noqa: F401
    from glimpseprune_tpu.training.losses import mask_confusion_stats as stats

    rng = np.random.default_rng(3)
    B, N = 5, 37
    lens = [37, 20, 31, 9, 37]
    keep = rng.random((B, N)) < 0.4
    target = rng.random((B, N)) < 0.3
    keep[3] = False
    target[3] = False  # all-empty row -> reference IoU fallback 0
    valid = np.zeros((B, N), dtype=bool)
    for b, n in enumerate(lens):
        valid[b, :n] = True
    keep &= valid
    target &= valid

    ref_metrics = ref.cal_box_metrics(
        [torch.tensor(keep[b, :lens[b]]) for b in range(B)],
        [torch.tensor(target[b, :lens[b]]) for b in range(B)],
    )
    s = stats(jnp.asarray(keep), jnp.asarray(target), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(s["iou"]),
                               np.asarray(ref_metrics[ref.IOU_KEY]), atol=1e-12)
    for b in range(B):
        cm = ref_metrics[ref.CONF_MAT_KEY][b]
        assert int(s["tp"][b]) == cm[0, 0] and int(s["fp"][b]) == cm[0, 1]
        assert int(s["fn"][b]) == cm[1, 0] and int(s["tn"][b]) == cm[1, 1]
