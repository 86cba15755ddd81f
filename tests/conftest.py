"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4):
multi-chip sharding paths are exercised on virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
