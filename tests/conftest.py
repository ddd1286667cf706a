"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding is validated without TPUs by forcing 8 host devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the framework's
test strategy (SURVEY.md section 4). Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
