#!/usr/bin/env python
"""Benchmark: EfficientDet-D0 COCO-class inference images/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The baseline
for vs_baseline is the BASELINE.json north-star: >= 3x an A100-class PyTorch
images/sec/chip for D0 COCO inference. The reference publishes no throughput
number (BASELINE.md); a well-tuned A100 PyTorch EfficientDet-D0 at 512px runs
~250 img/s end-to-end, so vs_baseline = value / 750.

Measures the FULL path on device: backbone -> BiFPN -> head -> decode ->
clip -> batched NMS (bfloat16 compute, f32 params), batch 32.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# NOTE: 750 = 3x an ESTIMATED ~250 img/s for a well-tuned A100 PyTorch
# EfficientDet-D0@512 (the reference publishes no throughput number,
# BASELINE.md); vs_baseline is relative to that estimate, not a measurement.
BASELINE_IMG_PER_SEC = 750.0


def _init_backend_with_retry():
    """Initialize the TPU backend, riding out transient axon-tunnel failures.

    Round 1's bench recorded nothing because one 'Unable to initialize
    backend axon: UNAVAILABLE' killed the process (BENCH_r01.json rc=1).
    jax memoizes backend-init failure in-process, so the only clean retry
    is to re-exec this script; bounded by BENCH_INIT_RETRIES attempts with
    exponential backoff."""
    import subprocess

    from efficientdet_tpu.utils.jax_setup import enable_compilation_cache

    try:
        # axon init can BLOCK indefinitely inside C (not raise) when the
        # tunnel is wedged — SIGALRM can't interrupt it (GIL held), so probe
        # init in a killable subprocess first and route a hang into the same
        # bounded-retry path as an init error.
        budget = int(os.environ.get("BENCH_INIT_TIMEOUT", "240"))
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=budget, check=True, capture_output=True)
        import jax
        enable_compilation_cache()
        return jax.devices()
    except (RuntimeError, subprocess.TimeoutExpired,
            subprocess.CalledProcessError) as e:
        attempt = int(os.environ.get("_BENCH_INIT_ATTEMPT", "0"))
        max_tries = int(os.environ.get("BENCH_INIT_RETRIES", "6"))
        if attempt + 1 >= max_tries:
            print(json.dumps({
                "metric": "bench_error", "value": None, "unit": "error",
                "vs_baseline": None,
                "error": f"backend init failed after {max_tries} tries: {e}"}))
            sys.exit(1)
        # capped exponential backoff: tunnel wedges observed lasting >1h —
        # a wider bounded window costs little and rides out short outages
        delay = min(30.0 * (2 ** attempt), 300.0)
        print(f"backend init failed ({e}); retry {attempt + 1}/{max_tries} "
              f"in {delay:.0f}s", file=sys.stderr)
        time.sleep(delay)
        os.environ["_BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        os.execve(sys.executable, [sys.executable] + sys.argv,
                  dict(os.environ))

# Paper FLOPs per image (arXiv:1911.09070 table 1), used to scale the D0
# baseline to other variants: baseline(net) = 750 * FLOPS["d0"] / FLOPS[net].
FLOPS = {"d0": 2.54, "d1": 6.1, "d2": 11.0, "d3": 24.9, "d4": 55.2,
         "d5": 135.4, "d6": 225.6, "d7": 325.0}


def _bench_loop(step_fn, args, iters):
    """Dispatch `iters` steps back-to-back, block on the final result (the
    device stream is sequential, so this bounds total device time)."""
    import jax
    out = step_fn(*args)
    jax.block_until_ready(out)   # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    _init_backend_with_retry()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from efficientdet_tpu import DetectorConfig
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.train import (OptimizerConfig, create_train_state,
                                        make_eval_step, make_train_step)

    # infer|latency|train|pallas|fusedmb|approx
    mode = os.environ.get("BENCH_MODE", "infer")
    network = os.environ.get("BENCH_NETWORK", "efficientdet-d0")
    # measured v5e throughput for D0@512 with the serving path (packed
    # class reduction + u32-packed top-k + Pallas NMS):
    # batch 128: 1519.6, 256: 1538.9 img/s (BENCH_MODES.json)
    batch = int(os.environ.get(
        "BENCH_BATCH", {"latency": "1", "train": "64"}.get(mode, "256")))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    cfg = DetectorConfig(num_classes=80, network=network).resolve()
    if mode == "approx":
        # A/B: lax.approx_max_k (TPU PartialReduce, the hardware
        # radix-select) vs the default u32 packed-sort candidate selection
        import dataclasses
        cfg = dataclasses.replace(cfg, approx_topk=True)
    model = EfficientDet(config=cfg, dtype=jnp.bfloat16,
                         use_pallas_fusion=(mode == "pallas"))
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(batch, cfg.input_size, cfg.input_size, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images[:1])

    tag = network.replace("efficientdet-", "")
    baseline = BASELINE_IMG_PER_SEC * FLOPS["d0"] / FLOPS.get(tag, FLOPS["d0"])

    if mode == "train":
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   cfg.input_size, OptimizerConfig())
        ann = -np.ones((batch, 16, 5), np.float32)
        ann[:, 0] = [60, 60, 200, 220, 3]
        batch_data = {"images": images, "annotations": jnp.asarray(ann),
                      "scales": jnp.ones((batch,))}
        train_step = jax.jit(make_train_step(model, cfg),
                             donate_argnums=(0,))
        key = jax.random.PRNGKey(1)

        def step_fn(s):
            s2, _ = train_step(s, batch_data, key)
            return s2

        # keep threading state through iterations
        state = step_fn(state)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step_fn(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        value = batch * iters / dt
        print(json.dumps({
            "metric": f"efficientdet_{tag}_{cfg.input_size}_bf16_train_images_per_sec_per_chip",
            "value": round(value, 2), "unit": "images/sec",
            "vs_baseline": round(value / (baseline / 3), 3)}))
        return

    step = jax.jit(make_eval_step(model, cfg,
                                  fused_backbone=(mode == 'fusedmb')))
    dt = _bench_loop(step, (variables, images), iters)

    if mode == "latency":
        p50_ms = dt / iters * 1000
        print(json.dumps({
            "metric": f"efficientdet_{tag}_{cfg.input_size}_bf16_e2e_latency_batch1",
            "value": round(p50_ms, 3), "unit": "ms",
            "vs_baseline": round(4.0 / max(p50_ms, 1e-9), 3)}))
        return

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": f"efficientdet_{tag}_{cfg.input_size}_bf16_inference_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
