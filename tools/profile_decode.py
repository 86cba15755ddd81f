#!/usr/bin/env python
"""Decode-step cost decomposition on the real chip.

Times one decode step at several KV context lengths T for the bench 7B int8
config; the slope over T separates ctx-proportional traffic (cache
scan-copy + attention reads) from the flat weight cost (layer stack +
lm_head). Run: python tools/profile_decode.py [scale]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    scale = sys.argv[1] if len(sys.argv) > 1 else "7b"
    kv_quant = sys.argv[2] if len(sys.argv) > 2 else ""
    os.environ.setdefault("BENCH_QUANT", "int8" if scale == "7b" else "")

    import jax
    import jax.numpy as jnp

    from bench import build_cfg
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.quantization import quantize_structure, quantized_config

    cfg = build_cfg(scale)
    if os.environ.get("BENCH_QUANT"):
        # honor the tier value (BENCH_QUANT=int4 measures the int4 decode)
        cfg = quantized_config(cfg, os.environ["BENCH_QUANT"])
    model = Qwen2_5_VL_GP(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    tc = cfg.text
    L, B = tc.num_hidden_layers, 1
    Hkv, D = tc.num_key_value_heads, tc.head_dim

    # init only the text tower params via eval_shape-free direct init
    rng = jax.random.PRNGKey(0)
    dummy_tok = jnp.zeros((B, 4), jnp.int32)
    pos = jnp.zeros((3, B, 4), jnp.int32)

    def init_text(r):
        return model.init(
            r, dummy_tok, pos,
            jnp.zeros((L, B, 8, Hkv, D), jnp.bfloat16),
            jnp.zeros((L, B, 8, Hkv, D), jnp.bfloat16),
            jnp.zeros((B, 8), bool), jnp.int32(4),
            method=model.decode_step,
        )

    params = jax.jit(init_text)(rng)["params"]

    trivial = jax.jit(lambda x: x + 1)
    float(trivial(jnp.zeros(8))[0])
    rtts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(trivial(jnp.full((8,), float(i)))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"tunnel rtt {rtt*1e3:.1f} ms")

    def timeit(fn, iters=4):
        float(fn(jnp.float32(0.0)))
        ts = []
        for i in range(1, iters + 1):
            t0 = time.perf_counter()
            float(fn(jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - rtt, 1e-6)

    STEPS = 32

    from glimpseprune_tpu.ops.kv_cache import alloc_cache

    for T in (2048, 8192, 16896):
        kc = alloc_cache((L, B, T, Hkv, D), jnp.bfloat16, kv_quant)
        vc = alloc_cache((L, B, T, Hkv, D), jnp.bfloat16, kv_quant)
        kvv = jnp.ones((B, T), bool).at[:, T - STEPS:].set(False)

        @jax.jit
        def chunk(params, i, kc, vc, kvv):
            def run(m):
                return m.decode_chunk(
                    jnp.full((B,), 5, jnp.int32) + (i * 0).astype(jnp.int32),
                    jnp.full((3, B), T - STEPS, jnp.int32), kc, vc, kvv,
                    jnp.int32(T - STEPS), jax.random.PRNGKey(0),
                    n_steps=STEPS, eos_token_id=-1, temperature=0.0,
                )
            toks, *_ = model.apply(params, method=run)
            return toks.astype(jnp.float32).sum() + i

        t = timeit(lambda i, kc=kc, vc=vc, kvv=kvv: chunk(
            {"params": params}, i, kc, vc, kvv))
        print(f"T={T:6d}: {t/STEPS*1e3:7.2f} ms/step  ({STEPS} steps scan)")

    # lm_head alone (fp or quantized tier)
    from glimpseprune_tpu.models.qwen2_5_vl.language import _dense

    hp = params["text"]["lm_head"]
    h = jnp.zeros((B, 1, tc.hidden_size), jnp.bfloat16)

    @jax.jit
    def head(hp, i):
        return _dense(h + i, hp, jnp.bfloat16).astype(jnp.float32).max()

    t0 = timeit(lambda i: head(hp, i))
    nbytes = sum(np.prod(a.shape) * a.dtype.itemsize for a in jax.tree.leaves(hp))
    kinds = ",".join(sorted(hp))
    print(f"lm_head [{tc.hidden_size}x{tc.vocab_size}] ({kinds}): {t0*1e3:.2f} ms"
          f" ({nbytes / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
