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

    jax.config.update("jax_platforms", plat)
