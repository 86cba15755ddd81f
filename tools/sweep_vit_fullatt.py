#!/usr/bin/env python
"""Block-size sweep for the ViT full-attention flash kernel.

The 4 global-attention blocks of the Qwen2.5-VL ViT dominate large-image
vision time (P=65536 patches, D=80: 22 TFLOP each). D=80 pads to 128 on the
MXU (62.5% ceiling -> ~123 TF/s on v5e); this sweep finds the block shape
that gets closest. Run on the real chip: python tools/sweep_vit_fullatt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp

    from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention

    B, H, S, D = 1, 16, 65536, 80
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    seg = jnp.zeros((B, S), jnp.int32)

    trivial = jax.jit(lambda x: x + 1)
    float(trivial(jnp.zeros(8))[0])
    rtts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(trivial(jnp.full((8,), float(i)))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    flops = 4.0 * S * S * D * H  # qk + pv

    for bq, bk in [(1024, 1024), (2048, 1024), (1024, 2048), (2048, 2048),
                   (4096, 1024), (512, 2048)]:
        try:
            fn = jax.jit(
                lambda q, k, v, i, bq=bq, bk=bk: flash_attention(
                    q + i * 1e-6, k, v, seg, seg, causal=False,
                    block_q=bq, block_k=bk,
                ).astype(jnp.float32).sum()
            )
            float(fn(q, k, v, jnp.float32(0.0)))
            ts = []
            for i in range(1, 4):
                t0 = time.perf_counter()
                float(fn(q, k, v, jnp.float32(i)))
                ts.append(time.perf_counter() - t0)
            t = max(min(ts) - rtt, 1e-6)
            print(f"bq={bq:5d} bk={bk:5d}: {t*1e3:7.1f} ms  "
                  f"{flops/t/1e12:6.1f} TF/s")
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
