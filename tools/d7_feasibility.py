#!/usr/bin/env python
"""Single-chip D7 feasibility probe (VERDICT r2 next-step #8).

D5-D7 are configured (config.py:107-124, mirroring reference
utils/config_eff.py:37-41) but were never exercised on the chip. This tool
answers, for the top variant on ONE v5e chip:

  1. does D7@1636 bf16 serving (batch 1, full NMS tail) fit? p50 latency?
  2. does a D7@1636 train step (batch 1, AdamW, frozen BN) fit with
     --remat? without? step time?

Each probe runs in its own subprocess so an OOM kills the probe, not the
sweep; results print as one JSON line per probe (appended to stdout) for
transcription into docs/DESIGN.md.

Usage: python tools/d7_feasibility.py [--network efficientdet-d7]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import json, os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax, jax.numpy as jnp, numpy as np
from efficientdet_tpu import DetectorConfig
from efficientdet_tpu.models import EfficientDet
from efficientdet_tpu.train import (OptimizerConfig, create_train_state,
                                    make_eval_step, make_train_step)
from efficientdet_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
mode = sys.argv[1]            # serve | train | train_noremat
network = sys.argv[2]
batch = int(sys.argv[3])
iters = int(sys.argv[4])

cfg = DetectorConfig(num_classes=80, network=network).resolve()
remat = (mode == "train")
model = EfficientDet(config=cfg, dtype=jnp.bfloat16, remat=remat)
rng = np.random.RandomState(0)
images = jnp.asarray(
    rng.rand(batch, cfg.input_size, cfg.input_size, 3).astype(np.float32))

if mode == "serve":
    variables = model.init(jax.random.PRNGKey(0), images[:1])
    step = jax.jit(make_eval_step(model, cfg))
    out = step(variables, images)          # compile + first run
    jax.block_until_ready(out.scores)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, images)
    jax.block_until_ready(out.scores)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"probe": f"{network}_serve_b{batch}", "fits": True,
                      "latency_ms": round(dt * 1000, 2),
                      "img_per_sec": round(batch / dt, 2),
                      "input_size": cfg.input_size, "remat": False}))
else:
    state = create_train_state(model, jax.random.PRNGKey(0),
                               cfg.input_size, OptimizerConfig())
    ann = -np.ones((batch, 16, 5), np.float32)
    ann[:, 0] = [60, 60, 200, 220, 3]
    batch_data = {"images": images, "annotations": jnp.asarray(ann)}
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    state, _ = step(state, batch_data, key)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, batch_data, key)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"probe": f"{network}_{mode}_b{batch}", "fits": True,
                      "step_ms": round(dt * 1000, 2),
                      "img_per_sec": round(batch / dt, 2),
                      "input_size": cfg.input_size, "remat": remat}))
"""


def run_probe(mode, network, batch, iters, timeout=2400):
    proc = subprocess.run(
        [sys.executable, "-c", PROBE, mode, network, str(batch), str(iters)],
        capture_output=True, text=True, timeout=timeout, cwd=ROOT)
    line = None
    for ln in proc.stdout.strip().splitlines():
        if ln.startswith("{"):
            line = json.loads(ln)
    if line is None:
        err = (proc.stderr or "")[-2000:]
        oom = ("RESOURCE_EXHAUSTED" in err or "Out of memory" in err
               or "out of memory" in err or "exceeds the maximum" in err)
        line = {"probe": f"{network}_{mode}_b{batch}", "fits": False,
                "oom": oom, "error_tail": err[-400:]}
    print(json.dumps(line), flush=True)
    return line


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="efficientdet-d7")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--probes", default="serve,train,train_noremat")
    p.add_argument("--out", default=None,
                   help="append results into this JSON artifact (e.g. "
                        "D7_FEASIBILITY.json), replacing same-probe rows")
    args = p.parse_args()
    import datetime
    try:
        import jax
        device = str(jax.devices()[0])
    except Exception as e:
        device = f"unknown ({e})"
    rows = []
    for probe in args.probes.split(","):
        row = run_probe(probe, args.network, 1, args.iters)
        row.update(device=device, date=datetime.date.today().isoformat())
        rows.append(row)
    if args.out:
        records = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                new = {r["probe"] for r in rows}
                records = [r for r in json.load(f)
                           if r.get("probe") not in new]
        records.extend(rows)
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {args.out} ({len(records)} probes)")


if __name__ == "__main__":
    main()
