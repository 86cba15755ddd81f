"""Smoke test for tools/compare_server.py (reference results_vis_compare.py
:17-357 analogue): index aggregates, sample panels, mask-overlay PNG,
score-filter behavior — driven over real HTTP against a live server."""

import json
import os
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture()
def result_dirs(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows_a, rows_b = [], []
    for i in range(3):
        name = f"img{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)
        ).save(img_dir / name)
        base = {
            "question_id": f"q{i}",
            "dataset": "synth",
            "query": f"what is {i}?",
            "answer": "gt",
            "img_path": str(img_dir / name),
            "num_gen_tokens": 4 + i,
        }
        rows_a.append({
            **base, "response": f"A says {i}", "iou": 0.5 + 0.1 * i,
            "mask_ratio": 0.1,
            "keep_mask": [1, 0, 0, 1], "token_grid": [2, 2],
        })
        rows_b.append({**base, "response": f"B says {i}"})
    a_path, b_path = tmp_path / "a_generate.jsonl", tmp_path / "b_generate.jsonl"
    for path, rows in ((a_path, rows_a), (b_path, rows_b)):
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    # scores: A wins on q0, loses on q1, ties on q2
    for path, scores in ((a_path, [1.0, 0.0, 0.5]), (b_path, [0.0, 1.0, 0.5])):
        with open(str(path).replace(".jsonl", "_score.jsonl"), "w") as f:
            for i, s in enumerate(scores):
                f.write(json.dumps({"question_id": f"q{i}", "score": s}) + "\n")
    return str(a_path), str(b_path)


def _serve(args):
    import compare_server

    state = compare_server.CompareState(args)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), compare_server.make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, state


def _get(srv, path):
    url = f"http://127.0.0.1:{srv.server_address[1]}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_compare_server_pages(result_dirs):
    import compare_server

    a, b = result_dirs
    args = compare_server.parse_args([a, b])
    srv, state = _serve(args)
    try:
        assert len(state.ids) == 3
        code, ctype, body = _get(srv, "/")
        assert code == 200 and b"3 joined samples" in body
        assert b"iou" in body and b"score" in body  # aggregate table

        code, _, body = _get(srv, "/sample/0")
        assert code == 200
        assert b"A says 0" in body and b"B says 0" in body
        assert b"what is 0?" in body and b"/img/0/a" in body

        code, ctype, png = _get(srv, "/img/0/a")
        assert code == 200 and ctype == "image/png"
        assert png[:4] == b"\x89PNG"
        # side B has no mask -> still renders the raw image
        code, ctype, _ = _get(srv, "/img/0/b")
        assert code == 200 and ctype == "image/png"
    finally:
        srv.shutdown()


def test_compare_server_filters(result_dirs):
    import compare_server

    a, b = result_dirs
    args = compare_server.parse_args([a, b, "--filter-a-gt-b"])
    state = compare_server.CompareState(args)
    assert state.ids == ["q0"]  # only where A's score beats B's

    args = compare_server.parse_args([a, b, "--filter-iou-lt", "0.65"])
    state = compare_server.CompareState(args)
    assert state.ids == ["q0", "q1"]
