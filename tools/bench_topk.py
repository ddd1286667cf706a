#!/usr/bin/env python
"""A/B the serving candidate-selection variants on the chip.

Variants (ops/nms.py):
  packed  — u32 packed-sort top-k (`_packed_topk`, round-1 default)
  exact   — lax.top_k (f32 key + s32 iota pair sort; parity path)
  approx  — lax.approx_max_k (TPU PartialReduce, the hardware radix-select)

Each is measured end-to-end through the NMS tail on a D0-serving-shaped
problem (B x A anchors) with the bench-loop protocol (many back-to-back
dispatches, one final block — per-call timing lies on this rig, see
docs/DESIGN.md). VERDICT.md round-1 next-item 7.

    python tools/bench_topk.py [B] [iters]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # env JAX_PLATFORMS is too late here (a site hook pre-imports jax
        # pinned to the TPU backend); the config update still works
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np

    from efficientdet_tpu.ops.anchors import anchors_for_image_size
    from efficientdet_tpu.ops.nms import batched_nms_from_scores

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    size = 512
    anchors = jnp.asarray(anchors_for_image_size(size))
    a = anchors.shape[0]
    rng = np.random.RandomState(0)
    # realistic serving score distribution: mostly sub-threshold noise with
    # a few hundred confident anchors per image
    scores = (rng.rand(b, a).astype(np.float32) * 0.02)
    for row in range(b):
        hot = rng.choice(a, size=300, replace=False)
        scores[row, hot] = rng.rand(300).astype(np.float32)
    scores = jnp.asarray(scores)
    classes = jnp.asarray(rng.randint(0, 80, (b, a)), dtype=jnp.int32)
    deltas = jnp.asarray(rng.randn(b, a, 4).astype(np.float32) * 0.1)

    def run(tag, **kw):
        fn = jax.jit(lambda s, c, d: batched_nms_from_scores(
            s, c, d, anchors, size, size, score_threshold=0.05,
            pre_nms_top_k=1000, max_detections=100, **kw))
        out = jax.block_until_ready(fn(scores, classes, deltas))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(scores, classes, deltas)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        n = int(np.asarray(out.valid).sum())
        print(json.dumps({"variant": tag, "batch": b,
                          "ms_per_batch": round(dt * 1e3, 3),
                          "us_per_image": round(dt / b * 1e6, 1),
                          "valid_dets": n}))
        return out

    # pallas suppression kernel is TPU-only; CPU smoke runs use the scan
    # formulation (same candidate-selection A/B is then exact-vs-approx only)
    m = "pallas" if jax.default_backend() in ("tpu", "axon") else "select"
    ref = run("packed", method=m)
    run("exact", method="select")
    apx = run("approx", method=m, approx_topk=True)
    agree = float((np.asarray(ref.valid) == np.asarray(apx.valid)).mean())
    print(json.dumps({"approx_vs_packed_valid_agreement": round(agree, 4)}))


if __name__ == "__main__":
    main()
