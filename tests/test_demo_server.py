"""Browser demo server (tools/demo_server.py): real HTTP round-trip on the
tiny model — page load, SSE token stream, overlay payload, GP-off path.
Replaces the reference Gradio UI demo_gp.py:220-247 (gradio not
installable here)."""

import base64
import io
import json
import os
import socket
import sys
import threading
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _events(resp):
    out = []
    for block in resp.read().decode().split("\n\n"):
        if block.startswith("data: "):
            out.append(json.loads(block[6:]))
    return out


def test_demo_server_http_roundtrip(tmp_path):
    from PIL import Image

    import demo_server

    class Args:
        tiny = True
        hf_model = None
        new_modules = None
        int8 = False

    state = demo_server.DemoState(Args())
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(
        ("127.0.0.1", port), demo_server.make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(base + "/", timeout=30).read().decode()
        assert "GlimpsePrune" in page and "max remain ratio" in page

        rng = np.random.default_rng(0)
        img = Image.fromarray(
            rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payload = {
            "image": base64.b64encode(buf.getvalue()).decode(),
            "question": "hi",
            "do_selection": True,
            "max_remain_ratio": 0.3,
            "reduce_threshold": 0.5,
            "max_new_tokens": 6,
        }
        req = urllib.request.Request(
            base + "/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        evs = _events(urllib.request.urlopen(req, timeout=300))
        kinds = [e["type"] for e in evs]
        assert "token" in kinds and kinds[-1] == "done", kinds
        done = evs[-1]
        assert done["overlay"] is not None
        # the overlay decodes back to a PNG of the input size
        over = Image.open(io.BytesIO(base64.b64decode(done["overlay"])))
        assert over.size == img.size
        assert 0.0 <= done["prune_ratio"] <= 1.0

        # GP off: single text event, no overlay
        payload["do_selection"] = False
        req = urllib.request.Request(
            base + "/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        evs = _events(urllib.request.urlopen(req, timeout=300))
        assert [e["type"] for e in evs] == ["token", "done"]
        assert evs[-1]["overlay"] is None

        # runner cache: same sliders reuse the compiled runner
        assert len(state._runners) == 1
    finally:
        srv.shutdown()
