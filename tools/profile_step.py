#!/usr/bin/env python
"""Profile one jitted step on-device and print a per-op time table.

The reference has no profiling support at all (SURVEY.md section 5); this is
the framework's tracing entry point. It wraps ``jax.profiler`` around the
inference / serving / train step, then parses the chrome-trace JSON that the
TPU (or CPU) runtime emits and aggregates device-side op durations.

NOTE: on tunneled TPU rigs, per-call wall-clock timing of dispatches is NOT
trustworthy (repeated executions may be elided); the profiler trace durations
used here are the reliable signal. See docs/DESIGN.md "Measurement notes".

Usage:
  python tools/profile_step.py --mode infer --network efficientdet-d0 \
      --batch 32 --iters 3 [--trace_dir /tmp/edt_trace] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def parse_device_ops(trace_dir: str):
    """-> (total_us, {op_name: (us, count, category)}, {category: us}) from
    the newest chrome trace. Only events carrying an ``hlo_category`` arg are
    HLO ops — step markers and whole-module executions (which would
    double-count the step) are excluded."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    cat = {}
    by_cat = collections.defaultdict(float)
    for e in events:
        pname = proc_names.get(e.get("pid"), "")
        if e.get("ph") != "X" or not ("TPU" in pname or "/device" in pname):
            continue
        c = e.get("args", {}).get("hlo_category")
        if c is None:
            continue
        dur[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        cat[e["name"]] = c
        by_cat[c] += e.get("dur", 0)
    return (sum(dur.values()),
            {n: (d, cnt[n], cat[n]) for n, d in dur.items()},
            dict(by_cat))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="infer",
                    choices=["infer", "serving", "train"])
    ap.add_argument("--network", default="efficientdet-d0")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num_class", type=int, default=80)
    ap.add_argument("--input_size", type=int, default=None,
                    help="override the network's native resolution "
                         "(for quick CPU smoke runs)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--trace_dir", default="/tmp/edt_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); needed because "
                         "site hooks may pin the platform before env vars "
                         "apply")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from efficientdet_tpu import DetectorConfig
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.train import (OptimizerConfig, create_train_state,
                                        make_eval_step, make_train_step)

    cfg = DetectorConfig(num_classes=args.num_class, network=args.network,
                         input_size=args.input_size).resolve()
    model = EfficientDet(config=cfg,
                         dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(args.batch, cfg.input_size, cfg.input_size,
                                  3).astype(np.float32))

    if args.mode == "train":
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   cfg.input_size, OptimizerConfig())
        ann = -np.ones((args.batch, 16, 5), np.float32)
        ann[:, 0] = [60, 60, 200, 220, 3]
        batch = {"images": images, "annotations": jnp.asarray(ann),
                 "scales": jnp.ones((args.batch,))}
        step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        state, _ = step(state, batch, key)
        jax.block_until_ready(state.params)
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.iters):
            state, _ = step(state, batch, key)
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
    else:
        variables = model.init(jax.random.PRNGKey(0), images[:1])
        step = jax.jit(make_eval_step(model, cfg))
        jax.block_until_ready(step(variables, images))
        jax.profiler.start_trace(args.trace_dir)
        out = None
        for _ in range(args.iters):
            out = step(variables, images)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

    total_us, ops, by_cat = parse_device_ops(args.trace_dir)
    it = args.iters
    if not ops:
        print("note: no device-side ops in the trace — per-op attribution "
              "needs a TPU run (CPU traces carry host events only); trace "
              f"written to {args.trace_dir} for tensorboard")
    print(f"# {args.network} {args.mode} batch={args.batch} "
          f"iters={it} — device op time {total_us / it / 1e3:.2f} ms/step")
    print("# by hlo_category:")
    for c, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us / it / 1e3:9.3f}  {100 * us / max(total_us, 1):5.1f}%  {c}")
    print(f"# top ops:\n{'ms/step':>9}  {'calls':>5}  op")
    shown = 0.0
    for name, (us, n, c) in sorted(ops.items(), key=lambda kv: -kv[1][0]):
        if shown >= args.top:
            break
        shown += 1
        print(f"{us / it / 1e3:9.3f}  {n // it:5d}  [{c}] {name[:80]}")


if __name__ == "__main__":
    main()
