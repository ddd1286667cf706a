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
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_IMG_PER_SEC = 750.0  # 3x A100-class (~250 img/s) target


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from efficientdet_tpu import DetectorConfig
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.train import make_eval_step

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    cfg = DetectorConfig(num_classes=80, network="efficientdet-d0").resolve()
    model = EfficientDet(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(batch, cfg.input_size, cfg.input_size, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images[:1])
    step = jax.jit(make_eval_step(model, cfg))

    # warmup / compile
    out = step(variables, images)
    jax.block_until_ready(out)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "efficientdet_d0_512_bf16_inference_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
