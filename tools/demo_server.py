#!/usr/bin/env python
"""Browser demo server — the reference's Gradio UI (demo_gp.py:220-247)
rebuilt on the stdlib (gradio is not installable in this environment).

Serves a single-page UI: image upload, question box, GP on/off, max-remain
-ratio + reduce-threshold sliders, STREAMED answer (Server-Sent Events over
chunked `stream_generate` — the TextIteratorStreamer analogue), and the
kept-token overlay image (utils/viz.apply_mask_on_image, reference
demo_gp.py:23-52).

Slider values are config-level knobs: changing max_remain_ratio changes the
static compacted length, so each distinct (ratio, threshold, selection)
tuple builds a runner once (jit-cached thereafter; first request per tuple
pays the compile).

Usage:
  python tools/demo_server.py --tiny                 # random tiny model
  python tools/demo_server.py --hf-model /path/Qwen2.5-VL-3B-Instruct \\
      --new-modules ckpt/gp --int8 --port 7860
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>GlimpsePrune TPU demo</title>
<style>
 body{font-family:sans-serif;max-width:900px;margin:24px auto;padding:0 12px}
 #row{display:flex;gap:16px}  #left,#right{flex:1}
 img{max-width:100%;border:1px solid #ccc}
 #answer{white-space:pre-wrap;border:1px solid #ccc;min-height:80px;padding:8px}
 label{display:block;margin-top:8px}
</style></head><body>
<h2>GlimpsePrune (TPU) — visual token pruning demo</h2>
<div id="row"><div id="left">
 <input type="file" id="img" accept="image/*"><br>
 <img id="preview" hidden>
 <label>Question <input id="q" size="50" value="What is in the image?"></label>
 <label><input type="checkbox" id="gp" checked> GlimpsePrune enabled</label>
 <label>max remain ratio <input id="ratio" type="range" min="0.02" max="1.0"
   step="0.01" value="0.111"> <span id="ratio_v">0.111</span></label>
 <label>reduce threshold <input id="thr" type="range" min="0" max="1"
   step="0.05" value="0.5"> <span id="thr_v">0.5</span></label>
 <label>max new tokens <input id="maxnew" type="number" value="128"></label>
 <button id="go">Generate</button>
</div><div id="right">
 <h4>Answer</h4><div id="answer"></div>
 <h4>Kept tokens <span id="stats"></span></h4><img id="overlay" hidden>
</div></div>
<script>
const $=id=>document.getElementById(id);
$('ratio').oninput=()=>$('ratio_v').textContent=$('ratio').value;
$('thr').oninput=()=>$('thr_v').textContent=$('thr').value;
let imgB64=null;
$('img').onchange=e=>{const f=e.target.files[0];const r=new FileReader();
 r.onload=()=>{imgB64=r.result.split(',')[1];$('preview').src=r.result;
  $('preview').hidden=false};r.readAsDataURL(f);};
$('go').onclick=async()=>{
 if(!imgB64){alert('choose an image');return}
 $('answer').textContent='';$('overlay').hidden=true;$('stats').textContent='…';
 const res=await fetch('/generate',{method:'POST',headers:{'Content-Type':
  'application/json'},body:JSON.stringify({image:imgB64,question:$('q').value,
  do_selection:$('gp').checked,max_remain_ratio:+$('ratio').value,
  reduce_threshold:+$('thr').value,max_new_tokens:+$('maxnew').value})});
 const rd=res.body.getReader();const dec=new TextDecoder();let buf='';
 for(;;){const{done,value}=await rd.read();if(done)break;
  buf+=dec.decode(value,{stream:true});
  for(let i;(i=buf.indexOf('\\n\\n'))>=0;){const ev=buf.slice(0,i);buf=buf.slice(i+2);
   if(!ev.startsWith('data: '))continue;const d=JSON.parse(ev.slice(6));
   if(d.type=='token')$('answer').textContent+=d.text;
   else if(d.type=='done'){$('stats').textContent=
     d.prune_ratio!=null?`pruned ${(d.prune_ratio*100).toFixed(1)}% of ${d.n_tokens} tokens`:'';
    if(d.overlay){$('overlay').src='data:image/png;base64,'+d.overlay;
     $('overlay').hidden=false}}
   else if(d.type=='error')$('answer').textContent+='\\n[error] '+d.message;}}
};
</script></body></html>"""


class DemoState:
    """Loaded weights + a runner cache keyed by the slider tuple."""

    def __init__(self, args):
        import demo as demo_cli

        self.args = args
        if args.tiny or not args.hf_model:
            self.cfg, self.params, self.tok = demo_cli.make_tiny()
        else:
            self.cfg, self.params, self.tok = demo_cli.load_hf_model(
                args.hf_model, {})
            if args.new_modules:
                from glimpseprune_tpu.persistence import load_new_modules

                self.params, self.cfg = load_new_modules(
                    self.params, args.new_modules)
        if args.int8:
            from glimpseprune_tpu.quantization import (
                quantize_int8,
                quantized_config,
            )

            self.params = quantize_int8(self.params)
            self.cfg = quantized_config(self.cfg, act_quant="prefill")
        self._runners = {}
        self.lock = threading.Lock()  # one chip: serialize generate calls

    def runner(self, ratio: float, threshold: float):
        from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner

        key = (round(ratio, 4), round(threshold, 4))
        if key not in self._runners:
            cfg = self.cfg.replace_gp(
                max_remain_ratio=ratio, reduce_threshold=threshold,
            )
            self._runners[key] = GlimpsePruneRunner(cfg, self.params)
        return self._runners[key]

    def generate_events(self, payload):
        """Yield SSE event dicts for one request (tokens, then done)."""
        from PIL import Image

        from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs
        from glimpseprune_tpu.utils.viz import apply_mask_on_image

        image = np.asarray(
            Image.open(io.BytesIO(base64.b64decode(payload["image"])))
            .convert("RGB"))
        question = payload.get("question", "")
        ratio = float(payload.get("max_remain_ratio", 0.111))
        threshold = float(payload.get("reduce_threshold", 0.5))
        do_selection = bool(payload.get("do_selection", True))
        max_new = int(payload.get("max_new_tokens", 128))

        runner = self.runner(ratio, threshold)
        cfg = runner.cfg
        tok = self.tok
        ids = list(tok(question) if callable(tok) else tok.encode(question))
        prompt = ([cfg.vision_start_token_id, cfg.image_token_id,
                   cfg.vision_end_token_id] + ids)
        prep = prepare_inputs(cfg, [prompt], [image],
                              seq_multiple=8, patch_multiple=16)
        with self.lock:
            if do_selection:
                gen = runner.stream_generate(
                    prep, max_new_tokens=max_new, chunk_size=4)
                res = None
                while True:
                    try:
                        toks = next(gen)
                    except StopIteration as stop:
                        res = stop.value
                        break
                    piece = [int(x) for x in toks[0]
                             if int(x) != cfg.eos_token_id]
                    if piece:
                        yield {"type": "token",
                               "text": tok.decode(piece,
                                                  skip_special_tokens=True)}
                    if len(piece) < toks.shape[1]:
                        break
                while res is None:
                    try:
                        next(gen)
                    except StopIteration as stop:
                        res = stop.value
            else:
                res = runner.generate(prep, max_new_tokens=max_new,
                                      do_selection=False)
                text = tok.decode(
                    [int(x) for x in res.sequences[0, : res.num_generated[0]]],
                    skip_special_tokens=True)
                yield {"type": "token", "text": text}

        done = {"type": "done", "prune_ratio": None, "n_tokens": None,
                "overlay": None}
        if res.keep_img is not None and do_selection:
            gh = int(prep.grids[0][1] // cfg.vision.spatial_merge_size)
            gw = int(prep.grids[0][2] // cfg.vision.spatial_merge_size)
            mask = np.asarray(res.keep_img[0, : gh * gw]).reshape(gh, gw)
            over = Image.fromarray(apply_mask_on_image(image, mask))
            buf = io.BytesIO()
            over.save(buf, format="PNG")
            done.update(
                prune_ratio=float(res.prune_ratio[0]), n_tokens=gh * gw,
                overlay=base64.b64encode(buf.getvalue()).decode())
        yield done


def make_handler(state: DemoState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path not in ("/", "/index.html"):
                self.send_error(404)
                return
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            try:
                for ev in state.generate_events(payload):
                    self.wfile.write(
                        f"data: {json.dumps(ev)}\n\n".encode())
                    self.wfile.flush()
            except BrokenPipeError:
                pass
            except Exception as e:  # surface model errors to the page
                try:
                    self.wfile.write(
                        ("data: " + json.dumps(
                            {"type": "error", "message": str(e)}) + "\n\n")
                        .encode())
                except BrokenPipeError:
                    pass

    return Handler


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf-model")
    ap.add_argument("--new-modules")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    state = DemoState(args)
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    print(f"demo server on http://{args.host}:{args.port}  "
          f"(model: {'tiny' if args.tiny or not args.hf_model else args.hf_model})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
