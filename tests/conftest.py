"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding is validated without TPUs by forcing 8 host devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the framework's
test strategy (SURVEY.md section 4). Must run before jax is imported.
"""

import os

# FORCE cpu (the user profile exports JAX_PLATFORMS=axon — the real TPU —
# which would leave only 1 device and taint numerics with TPU conv precision).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# A site hook imports jax before conftest runs, so the env vars above are too
# late for jax's config defaults. Backends initialize lazily — config.update
# still wins as long as no array op has run yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")


# Persistent compilation cache: the host has a single CPU core, so XLA
# compiles dominate test wall-time; cache them across runs. Must go through
# jax.config (env vars are too late — the site hook already imported jax).
from efficientdet_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
