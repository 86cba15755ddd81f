"""Test config: force CPU with an 8-device virtual mesh.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4):
multi-chip sharding paths are exercised on virtual CPU devices.

Env vars alone are not enough here: the host env pins JAX_PLATFORMS=axon (TPU
tunnel), and the jaxtyping pytest plugin imports jax before this conftest
runs, so we go through jax.config.update (valid until the backend
initializes, which no plugin does at import time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
