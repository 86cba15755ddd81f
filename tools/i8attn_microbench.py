"""Microbench: flash kernel bf16 vs int8-QK vs int8-all.

Default shapes: (a) ViT-fullatt-like dense bidirectional [1, 16, 8192, 80];
(b) LLM-prefill-like causal [1, 28, 8192, 128]. At S=8192 each call is
~30 ms wall over the tunnel — the same order as the ~28 ms RTT being
subtracted, so per-variant differences there are noise-dominated. Pass
--s-vit 65536 (the REAL 16k-image operating point: 64k ViT patches) for
decisive ~100-300 ms/call timings.
Timing per CLAUDE.md: perturb an input in-program, sync on one scalar,
subtract ~28 ms RTT.
"""
import argparse
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, __file__.rsplit("/", 2)[0])
from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench(name, B, H, S, D, causal, kw):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    seg = jnp.zeros((B, S), jnp.int32)
    fn = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, seg, seg, causal=causal, dense=not causal, **kw))
    t0 = time.time()
    out = fn(q, k, v)
    float(out.astype(jnp.float32)[0, 0, 0, :4].sum())
    log(f"{name}: compile+first {time.time()-t0:.1f}s")
    times = []
    for i in range(4):
        qq = q + i * 1e-6
        t0 = time.time()
        o = fn(qq, k, v)
        float(o.astype(jnp.float32)[0, 0, 0, :4].sum())
        times.append(time.time() - t0)
    t = min(times) - 0.028
    flops = 4 * S * S * D * H * B * (0.5 if causal else 1.0)
    log(f"{name}: {t*1e3:.1f}ms {flops/t/1e12:.1f} TF/s (times={['%.3f'%x for x in times]})")


ap = argparse.ArgumentParser()
ap.add_argument("--s-vit", type=int, default=8192)
ap.add_argument("--s-llm", type=int, default=8192)
ap.add_argument("--skip-llm", action="store_true")
ap.add_argument("--skip-vit", action="store_true")
args = ap.parse_args()

log(f"devices: {jax.devices()}")
VARIANTS = (
    ("bf16", {}),
    ("qk8", {"qkv_int8": True}),
    # bare all8 rides the auto block_k bump (2048 when S > 1024)
    ("all8", {"qkv_int8": True, "pv_int8": True}),
    ("all8-bk1024", {"qkv_int8": True, "pv_int8": True, "block_k": 1024}),
    ("all8-bq2048", {"qkv_int8": True, "pv_int8": True, "block_q": 2048}),
)
if not args.skip_vit:
    for nm, kw in VARIANTS:
        try:
            bench(f"vit-{nm}", 1, 16, args.s_vit, 80, False, kw)
        except Exception as e:
            log(f"vit-{nm}: FAILED {type(e).__name__}: {str(e)[:200]}")
if not args.skip_llm:
    for nm, kw in VARIANTS:
        try:
            bench(f"llm-{nm}", 1, 28, args.s_llm, 128, True, kw)
        except Exception as e:
            log(f"llm-{nm}: FAILED {type(e).__name__}: {str(e)[:200]}")
log("MICRO DONE")
