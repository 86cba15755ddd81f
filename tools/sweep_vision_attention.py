#!/usr/bin/env python
"""On-chip sweep of the two ViT attention kernels at the 64k-patch shape.

Round-5 vision profile (docs/ROUND5.md): the 1.94 s vision encode is
61% full-attention kernel (4 blocks x 294 ms; flash kernel alone 267 ms,
82 TF/s) and ~33% windowed blocks (28 x 22.6 ms, of which 16.7 ms is
attention overhead for ~0.03 TF of math). This sweeps

  1. fused window attention vs wins_per_step (windows merged per grid
     step; block-diagonal mask) — the one-window version is fixed-
     overhead-bound at 1024 grid steps x 16 heads x 5 tiny dots;
  2. the flash full-attention kernel vs (block_q, block_k) at
     [1, 16, 65536, 80] dense (the in-situ configuration).

Protocol: perturbed inputs + scalar host-read sync, tunnel RTT
subtracted (docs/ROUND1.md). Run on the chip: python tools/sweep_vision_attention.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention
    from glimpseprune_tpu.ops.pallas.window_attention import (
        rotate_half_matrix,
        window_attention_fused,
    )

    P, H, D, WP = 65536, 16, 80, 64
    rng = jax.random.PRNGKey(0)

    trivial = jax.jit(lambda x: x + 1)
    float(trivial(jnp.zeros(8))[0])
    rtts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(trivial(jnp.full((8,), float(i)))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"tunnel rtt ~{rtt*1e3:.1f}ms")

    def timeit(fn, label, iters=3):
        try:
            t0 = time.perf_counter()
            float(fn(jnp.float32(0.0)))
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{label:44s}  FAILED: {type(e).__name__}: {str(e)[:120]}")
            return None
        ts = []
        for i in range(1, iters + 1):
            t0 = time.perf_counter()
            float(fn(jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - rtt) * 1e3
        print(f"{label:44s} {ms:9.2f} ms  (compile {compile_s:.0f}s)")
        return ms

    sections = set(sys.argv[1:]) or {"1", "1b", "2"}

    # ---- 1. fused window attention vs wins_per_step
    qkv = jax.device_put(jax.random.normal(rng, (P, 3, H, D), jnp.bfloat16))
    cos = jax.device_put(jax.random.normal(rng, (P, D), jnp.bfloat16) * 0.1 + 1)
    sin = jax.device_put(jax.random.normal(rng, (P, D), jnp.bfloat16) * 0.1)
    valid = jnp.ones((P,), bool)

    # W>=4 hangs the Mosaic compile >9 min (16 unrolled heads x [256, 256]
    # chains) and the linear VPU growth makes it a loser anyway — see
    # window_attention.WINS_PER_STEP.
    for W in (1, 2, 3) if "1" in sections else ():
        @functools.partial(jax.jit, static_argnums=(4,))
        def wfn(qkv, cos, sin, valid, W, i):
            out = window_attention_fused(qkv + i * 1e-6, cos, sin, valid, WP,
                                         wins_per_step=W)
            return out.astype(jnp.float32).sum() * 1e-9

        timeit(lambda i, W=W: wfn(qkv, cos, sin, valid, W, i),
               f"fused window attention W={W}")

    # ---- 1b. windowed-block decomposition: the profile shows
    # t_win - t_mm = 16.7 ms while the kernel alone is 8.2 ms — find the
    # ~8.5 ms gap (suspect: relayout copies at the pallas boundary, since
    # [P, 3840] -> [P, 3, 16, 80] splits the 128-lane-tiled minor dim).
    import numpy as np

    from glimpseprune_tpu.quantization import matmul_w8a8

    def quant(w):
        w = np.asarray(w, np.float32)
        scale = np.maximum(np.abs(w).max(axis=-2, keepdims=True), 1e-8) / 127.0
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return jax.device_put(q), jax.device_put(scale.astype(np.float32))

    HID = H * D  # 1280
    x = jax.device_put(jax.random.normal(rng, (P, HID), jnp.bfloat16))
    wqkv_q, wqkv_s = quant(np.random.default_rng(0).normal(size=(HID, 3 * HID)) / 36.0)
    wproj_q, wproj_s = quant(np.random.default_rng(1).normal(size=(HID, HID)) / 36.0)
    gamma = jnp.ones((HID,), jnp.float32)

    def rms(xx):
        xf = xx.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (gamma * xf * jax.lax.rsqrt(var + 1e-6)).astype(xx.dtype)

    @jax.jit
    def t_rms(x, i):
        return rms(x + i * 1e-6).astype(jnp.float32).sum() * 1e-9

    if "1b" in sections:
        timeit(lambda i: t_rms(x, i), "rms [P, 1280]")

    @jax.jit
    def t_qkv8(x, i):
        return matmul_w8a8(x + i * 1e-6, wqkv_q, wqkv_s,
                           jnp.bfloat16).astype(jnp.float32).sum() * 1e-9

    if "1b" in sections:
        timeit(lambda i: t_qkv8(x, i), "qkv matmul w8a8 [P,1280]x[1280,3840]")

    @functools.partial(jax.jit, static_argnums=(2,))
    def t_qkv_kernel(x, valid, W, i):
        qkvo = matmul_w8a8(x + i * 1e-6, wqkv_q, wqkv_s, jnp.bfloat16)
        out = window_attention_fused(qkvo.reshape(P, 3, H, D), cos, sin,
                                     valid, WP, wins_per_step=W)
        return out.astype(jnp.float32).sum() * 1e-9

    for W in (1, 2) if "1b" in sections else ():
        timeit(lambda i, W=W: t_qkv_kernel(x, valid, W, i),
               f"qkv(w8a8) -> reshape -> kernel W={W}")

    @functools.partial(jax.jit, static_argnums=(2,))
    def t_attn_half(x, valid, W, i):
        h = rms(x + i * 1e-6)
        qkvo = matmul_w8a8(h, wqkv_q, wqkv_s, jnp.bfloat16)
        out = window_attention_fused(qkvo.reshape(P, 3, H, D), cos, sin,
                                     valid, WP, wins_per_step=W)
        y = matmul_w8a8(out.reshape(P, HID), wproj_q, wproj_s, jnp.bfloat16)
        return (x + y).astype(jnp.float32).sum() * 1e-9

    for W in (1, 2) if "1b" in sections else ():
        timeit(lambda i, W=W: t_attn_half(x, valid, W, i),
               f"attn half-block (rms+qkv+kernel+proj+res) W={W}")

    # ---- 2. full-attention flash kernel vs (block_q, block_k), dense bf16
    q = jax.device_put(jax.random.normal(rng, (1, H, P, D), jnp.bfloat16))

    # bq=2048 rows and bk=4096 at bq=1024 exceed VMEM (compile helper dies);
    # 1024x1024 measured best (90.3 TF/s) and is the shipped default.
    for bq, bk in (((1024, 1024), (1024, 2048), (512, 2048), (512, 4096))
                   if "2" in sections else ()):
        @functools.partial(jax.jit, static_argnums=(1, 2))
        def ffn(q, bq, bk, i):
            out = flash_attention(q + i * 1e-6, q, q, None, None, causal=False,
                                  dense=True, block_q=bq, block_k=bk)
            return out.astype(jnp.float32).sum() * 1e-9

        ms = timeit(lambda i, bq=bq, bk=bk: ffn(q, bq, bk, i),
                    f"flash full-att dense bq={bq} bk={bk}")
        if ms:
            fl = 4 * P * P * H * D
            print(f"    -> {fl/(ms*1e-3)/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
