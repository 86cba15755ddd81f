"""Microbench: flash kernel bf16 vs int8-QK vs int8-all.

Shapes: (a) ViT-fullatt-like dense bidirectional [1, 16, 8192, 80];
(b) LLM-prefill-like causal [1, 28, 8192, 128] (smaller S than the 16k
operating point to keep each timing ~100ms; rates transfer).
Timing per CLAUDE.md: perturb an input in-program, sync on one scalar,
subtract ~28 ms RTT.
"""
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


log(f"devices: {jax.devices()}")
VARIANTS = (
    ("bf16", {}),
    ("qk8", {"qkv_int8": True}),
    ("all8", {"qkv_int8": True, "pv_int8": True}),
    # int8 operands halve tile VMEM: try bigger k blocks (grid overhead)
    ("all8-bk2048", {"qkv_int8": True, "pv_int8": True, "block_k": 2048}),
    ("all8-bq2048", {"qkv_int8": True, "pv_int8": True, "block_q": 2048}),
)
for nm, kw in VARIANTS:
    try:
        bench(f"vit-{nm}", 1, 16, 8192, 80, False, kw)
    except Exception as e:
        log(f"vit-{nm}: FAILED {type(e).__name__}: {str(e)[:200]}")
for nm, kw in VARIANTS:
    try:
        bench(f"llm-{nm}", 1, 28, 8192, 128, True, kw)
    except Exception as e:
        log(f"llm-{nm}: FAILED {type(e).__name__}: {str(e)[:200]}")
log("MICRO DONE")
