#!/usr/bin/env python
"""Single-chip D5-D7 feasibility probe (VERDICT r2 #8).

The top compound-scaling variants (reference utils/config_eff.py:37-41:
D5@1280, D6@1408, D7@1636) are configured but were never exercised on the
chip. This probe answers, per variant: does batch-1 bf16 serving fit a
single v5e chip's HBM, does a train step fit with --remat, and at what
throughput? Results go to stderr as they land and to D7_FEASIBILITY.json.

OOM is a *result* here, not a failure: jax raises RESOURCE_EXHAUSTED (or
XlaRuntimeError) on HBM exhaustion; we catch it per-config in a subprocess
(a dead TPU client can poison the process) and record {"fit": false}.

Usage: python tools/d7_feasibility.py [--networks d5,d6,d7] [--modes serve,train]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, {root!r})
import jax, jax.numpy as jnp, numpy as np
from efficientdet_tpu import DetectorConfig
from efficientdet_tpu.models import EfficientDet
from efficientdet_tpu.train import (OptimizerConfig, create_train_state,
                                    make_eval_step, make_train_step)

mode, network, remat = {mode!r}, {network!r}, {remat!r} == "True"
cfg = DetectorConfig(num_classes=80, network=network).resolve()
model = EfficientDet(config=cfg, dtype=jnp.bfloat16, remat=remat)
rng = np.random.RandomState(0)
B = 1
images = jnp.asarray(rng.rand(B, cfg.input_size, cfg.input_size, 3)
                     .astype(np.float32))
t_c0 = time.perf_counter()
if mode == "serve":
    variables = model.init(jax.random.PRNGKey(0), images)
    step = jax.jit(make_eval_step(model, cfg))
    out = step(variables, images)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t_c0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({{"fit": True, "latency_ms": round(dt / iters * 1e3, 2),
                       "images_per_sec": round(B * iters / dt, 2),
                       "compile_s": round(compile_s, 1)}}))
else:
    state = create_train_state(model, jax.random.PRNGKey(0), cfg.input_size,
                               OptimizerConfig())
    ann = -np.ones((B, 16, 5), np.float32)
    ann[:, 0] = [60, 60, 400, 420, 3]
    batch = {{"images": images, "annotations": jnp.asarray(ann),
              "scales": jnp.ones((B,))}}
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    state, _ = step(state, batch, key)
    jax.block_until_ready(state.params)
    compile_s = time.perf_counter() - t_c0
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, batch, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(json.dumps({{"fit": True, "step_ms": round(dt / iters * 1e3, 2),
                       "images_per_sec": round(B * iters / dt, 2),
                       "compile_s": round(compile_s, 1)}}))
"""


def run_probe(network, mode, remat):
    code = PROBE.format(root=ROOT, mode=mode, network=network,
                        remat=str(remat))
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=3000)
    rec = {"network": network, "mode": mode, "remat": remat, "batch": 1}
    line = next((ln for ln in proc.stdout.strip().splitlines()
                 if ln.startswith("{")), None)
    if line:
        rec.update(json.loads(line))
        return rec
    err = (proc.stderr or "").strip()
    oom = "RESOURCE_EXHAUSTED" in err or "Out of memory" in err.lower() \
        or "exceeds the capacity" in err
    rec.update({"fit": False, "oom": oom, "error": err[-400:]})
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--networks", default="d5,d6,d7")
    p.add_argument("--modes", default="serve,train")
    p.add_argument("--out", default=os.path.join(ROOT, "D7_FEASIBILITY.json"))
    args = p.parse_args()

    records = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            records = json.load(f)
    for tag in args.networks.split(","):
        network = f"efficientdet-{tag}"
        for mode in args.modes.split(","):
            for remat in ([False] if mode == "serve" else [True]):
                key = (network, mode, remat)
                records = [r for r in records
                           if (r["network"], r["mode"], r["remat"]) != key]
                print(f"== {network} {mode} remat={remat} ==",
                      file=sys.stderr)
                rec = run_probe(network, mode, remat)
                rec["date"] = datetime.date.today().isoformat()
                print(json.dumps(rec), file=sys.stderr)
                records.append(rec)
                with open(args.out, "w") as f:
                    json.dump(records, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
