#!/usr/bin/env python
"""Browser UI for side-by-side comparison of two eval result jsonls.

The TPU-native rebuild of the reference's Gradio results browser
(results_vis_compare.py:17-357: two methods' responses + scores next to the
image with the glimpse-mask overlay, plus score/IoU/ratio filters) on the
same stdlib-HTTP pattern as tools/demo_server.py — gradio is not
installable in this environment.

Usage:
  python tools/compare_server.py results/a_generate.jsonl \
      results/b_generate.jsonl [--img-dir DIR] [--port 7870]

Rows are joined on question_id. *_score.jsonl files next to each input are
picked up automatically (same convention as tools/compare_results.py).
Mask overlays render when rows carry keep_mask + token_grid (infer
--save-masks) and the source image resolves via img_path / --img-dir.
Filters mirror the reference's: --filter-a-gt-b / --filter-a-lt-b (score),
--filter-iou-lt X, --filter-ratio-lt X (applied to side A).
"""

import argparse
import html
import io
import json
import os
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def load_jsonl(path):
    with open(path) as f:
        return OrderedDict((r["question_id"], r) for r in map(json.loads, f))


def load_scores(path):
    score_path = path.replace(".jsonl", "_score.jsonl")
    if not os.path.exists(score_path):
        return {}
    with open(score_path) as f:
        return {r["question_id"]: r["score"] for r in map(json.loads, f)}


class CompareState:
    def __init__(self, args):
        self.args = args
        self.A = load_jsonl(args.a)
        self.B = load_jsonl(args.b)
        self.sa = load_scores(args.a)
        self.sb = load_scores(args.b)
        self.ids = [k for k in self.A if k in self.B]
        self.ids = [k for k in self.ids if self._keep(k)]

    def _keep(self, k):
        a, sa, sb = self.A[k], self.sa.get(k), self.sb.get(k)
        f = self.args
        if f.filter_a_gt_b and not (
            sa is not None and sb is not None and sa > sb
        ):
            return False
        if f.filter_a_lt_b and not (
            sa is not None and sb is not None and sa < sb
        ):
            return False
        if f.filter_iou_lt is not None and not (
            a.get("iou") is not None and a["iou"] < f.filter_iou_lt
        ):
            return False
        if f.filter_ratio_lt is not None and not (
            a.get("mask_ratio") is not None
            and a["mask_ratio"] < f.filter_ratio_lt
        ):
            return False
        return True

    def resolve_image(self, row):
        p = row.get("img_path")
        if not p:
            return None
        cands = [p]
        if self.args.img_dir:
            cands.append(os.path.join(self.args.img_dir, p))
            cands.append(os.path.join(self.args.img_dir, os.path.basename(p)))
        for c in cands:
            if os.path.exists(c):
                return c
        return None

    def overlay_png(self, side, idx):
        """Source image with the keep-mask overlay (green = kept tokens),
        reference apply_mask_on_image semantics (demo_gp.py:23-52)."""
        from PIL import Image

        row = (self.A if side == "a" else self.B)[self.ids[idx]]
        img_path = self.resolve_image(row)
        if img_path is None:
            return None
        img = Image.open(img_path).convert("RGB")
        mask, grid = row.get("keep_mask"), row.get("token_grid")
        if mask and grid:
            gh, gw = int(grid[0]), int(grid[1])
            m = np.asarray(mask[: gh * gw], dtype=np.uint8).reshape(gh, gw)
            m_img = Image.fromarray(m * 255).resize(img.size, Image.NEAREST)
            color = Image.new("RGB", img.size, self.args.color)
            alpha = Image.fromarray(
                (np.asarray(m_img) * self.args.alpha).astype(np.uint8)
            )
            img.paste(color, (0, 0), alpha)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def aggregates(self):
        out = {}
        for key in ("iou", "mask_ratio", "num_gen_tokens"):
            for side, rows, scores in (("a", self.A, self.sa),
                                       ("b", self.B, self.sb)):
                vals = [rows[k].get(key) for k in self.ids
                        if rows[k].get(key) is not None]
                if vals:
                    out.setdefault(key, {})[side] = float(np.mean(vals))
        if self.sa and self.sb:
            out["score"] = {
                "a": float(np.mean([self.sa[k] for k in self.ids
                                    if k in self.sa] or [np.nan])),
                "b": float(np.mean([self.sb[k] for k in self.ids
                                    if k in self.sb] or [np.nan])),
            }
        return out


PAGE = """<!doctype html><html><head><title>GP results compare</title><style>
body{{font-family:sans-serif;margin:1.5em;background:#fafafa}}
table{{border-collapse:collapse}} td,th{{border:1px solid #ccc;padding:4px 10px}}
.cols{{display:flex;gap:1.5em}} .panel{{flex:1;background:#fff;border:1px solid
#ddd;padding:1em;border-radius:6px}} img{{max-width:100%;border:1px solid #eee}}
.resp{{white-space:pre-wrap;background:#f4f6f8;padding:.6em;border-radius:4px}}
.nav a{{margin-right:1em}}</style></head><body>{body}</body></html>"""


def make_handler(state: CompareState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, data, ctype="text/html"):
            body = data.encode() if isinstance(data, str) else data
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            if not parts:
                return self._send(PAGE.format(body=self._index()))
            if parts[0] == "sample" and len(parts) == 2:
                return self._send(PAGE.format(body=self._sample(int(parts[1]))))
            if parts[0] == "img" and len(parts) == 3:
                png = state.overlay_png(parts[2], int(parts[1]))
                if png is None:
                    self.send_response(404)
                    self.end_headers()
                    return None
                return self._send(png, "image/png")
            self.send_response(404)
            self.end_headers()
            return None

        def _index(self):
            agg = state.aggregates()
            rows = "".join(
                f"<tr><td>{html.escape(k)}</td>"
                f"<td>{v.get('a', float('nan')):.4g}</td>"
                f"<td>{v.get('b', float('nan')):.4g}</td></tr>"
                for k, v in agg.items()
            )
            links = "".join(
                f'<li><a href="/sample/{i}">{html.escape(str(qid))}</a>'
                f" — A:{state.sa.get(qid, '-')}"
                f" B:{state.sb.get(qid, '-')}</li>"
                for i, qid in enumerate(state.ids[:500])
            )
            return (
                f"<h2>{html.escape(os.path.basename(state.args.a))} (A) vs "
                f"{html.escape(os.path.basename(state.args.b))} (B)</h2>"
                f"<p>{len(state.ids)} joined samples (after filters)</p>"
                f"<table><tr><th>metric</th><th>A</th><th>B</th></tr>{rows}"
                f"</table><h3>Samples</h3><ul>{links}</ul>"
            )

        def _sample(self, i):
            i = max(0, min(i, len(state.ids) - 1))
            qid = state.ids[i]
            a, b = state.A[qid], state.B[qid]

            def panel(side, row, score):
                img_html = (
                    f'<img src="/img/{i}/{side}">'
                    if state.resolve_image(row) else "<i>(no image)</i>"
                )
                stats = " ".join(
                    f"{k}={row[k]:.3f}" for k in ("iou", "mask_ratio")
                    if isinstance(row.get(k), float)
                )
                return (
                    f'<div class="panel"><h3>{side.upper()}'
                    f" — score {score if score is not None else '-'}"
                    f"</h3>{img_html}"
                    f'<p>{stats}</p><div class="resp">'
                    f"{html.escape(str(row.get('response')))}</div></div>"
                )

            nav = (
                f'<div class="nav"><a href="/">index</a>'
                f'<a href="/sample/{i - 1}">prev</a>'
                f'<a href="/sample/{i + 1}">next</a> sample {i + 1}/'
                f"{len(state.ids)}</div>"
            )
            return (
                f"{nav}<h2>{html.escape(str(qid))}</h2>"
                f"<p><b>Q:</b> {html.escape(str(a.get('query')))}</p>"
                f"<p><b>GT:</b> {html.escape(str(a.get('answer')))}</p>"
                f'<div class="cols">'
                f"{panel('a', a, state.sa.get(qid))}"
                f"{panel('b', b, state.sb.get(qid))}</div>"
            )

    return Handler


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--img-dir", default=None)
    ap.add_argument("--color", default="#00FF00")
    ap.add_argument("--alpha", type=float, default=0.4)
    ap.add_argument("--filter-a-gt-b", action="store_true")
    ap.add_argument("--filter-a-lt-b", action="store_true")
    ap.add_argument("--filter-iou-lt", type=float, default=None)
    ap.add_argument("--filter-ratio-lt", type=float, default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7870)
    return ap.parse_args(argv)


def main():
    args = parse_args()
    state = CompareState(args)
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    print(f"compare server on http://{args.host}:{srv.server_address[1]} "
          f"({len(state.ids)} samples)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
