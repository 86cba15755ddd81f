"""Honor JAX_PLATFORMS via jax.config — the env var alone is not enough.

On this machine the TPU plugin registers regardless of JAX_PLATFORMS, so a
CPU-pinned run (JAX_PLATFORMS=cpu) still initializes the TPU backend — and
hangs or errors whenever the device tunnel is down. jax.config.update
("jax_platforms", ...) after import DOES pin correctly (the backend
initializes lazily). Every CLI entry point calls this before first device
use; library code never does (the embedding application owns the choice).
Same dance as tests/conftest.py and bench.py.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    plat = (os.environ.get("JAX_PLATFORMS") or "").lower().strip()
    if not plat:
        return
    import jax

    if plat != "cpu" and "cpu" not in plat.split(","):
        # keep the host CPU backend registered alongside the accelerator
        # (first entry stays the default): host-side real-weight init
        # (bench BENCH_REAL_WEIGHTS, convergence_run --quant,
        # profile_train_step) does jax.devices("cpu") — pinning
        # JAX_PLATFORMS=axon alone would hide it. A cpu-pinned run keeps
        # the accelerator plugin OUT (tunnel-down protection), so "cpu"
        # stays exactly "cpu".
        plat = plat + ",cpu"
    jax.config.update("jax_platforms", plat)
