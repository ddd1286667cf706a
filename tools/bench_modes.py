#!/usr/bin/env python
"""Capture the full benchmark surface into BENCH_MODES.json.

VERDICT r2 #7: every throughput/latency number quoted in README/DESIGN must
be reproducible driver output, not prose. This tool shells out to bench.py
(one subprocess per mode: jax holds the TPU for the process lifetime and
bench.py owns backend-init retry) and appends one JSON object per
configuration to BENCH_MODES.json at the repo root.

Default sweep (the BASELINE.json config surface + the fused-MBConv A/B):
    infer D0 b256   — headline serving throughput
    latency D0 b1   — p50 end-to-end latency incl. NMS
    train D0 b64    — fwd+bwd+opt step
    fusedmb D0 b256 — Pallas fused-MBConv serving backbone A/B
    infer D1 b128 / infer D4 b16 — scale-up variants

Usage:
    python tools/bench_modes.py [--modes infer,latency,train,...]
        [--out BENCH_MODES.json]

Each record: the bench.py JSON line + {"mode", "network", "batch", "date",
"device"}.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (tag, BENCH_MODE, BENCH_NETWORK, BENCH_BATCH, BENCH_ITERS)
SWEEP = [
    ("infer_d0_b256", "infer", "efficientdet-d0", 256, 20),
    ("latency_d0_b1", "latency", "efficientdet-d0", 1, 100),
    ("train_d0_b64", "train", "efficientdet-d0", 64, 20),
    ("fusedmb_d0_b256", "fusedmb", "efficientdet-d0", 256, 20),
    ("infer_d0_b128", "infer", "efficientdet-d0", 128, 20),
    ("fusedmb_d0_b128", "fusedmb", "efficientdet-d0", 128, 20),
    # fused-MBConv A/B verdict pair: b128/b256 fault on the chip (TPU
    # device error at warmup — recorded above); b8 is the largest batch
    # where the fused path completes, and there it loses to XLA
    # (434.8 vs 539.0 img/s) — see docs/DESIGN.md for the verdict.
    ("infer_d0_b8", "infer", "efficientdet-d0", 8, 5),
    ("fusedmb_d0_b8", "fusedmb", "efficientdet-d0", 8, 5),
    ("infer_d1_b128", "infer", "efficientdet-d1", 128, 10),
    ("infer_d4_b16", "infer", "efficientdet-d4", 16, 10),
    # batch-throughput curve (VERDICT r3 #5: locate the knee between the
    # b8 dip and the b128+ plateau)
    ("infer_d0_b16", "infer", "efficientdet-d0", 16, 10),
    ("infer_d0_b32", "infer", "efficientdet-d0", 32, 10),
    ("infer_d0_b64", "infer", "efficientdet-d0", 64, 10),
    # steady-state variants: _bench_loop blocks ONCE at the end, so the
    # ~25 ms tunnel RTT inflates per-image time by RTT/(batch*iters) —
    # 0.63 ms/img at b8/iters5. High-iter rows measure the pipelined
    # steady state a real serving deployment sees (see DESIGN.md curve).
    ("train_d0_b64_i50", "train", "efficientdet-d0", 64, 50),
    ("infer_d0_b8_i100", "infer", "efficientdet-d0", 8, 100),
    ("infer_d0_b16_i100", "infer", "efficientdet-d0", 16, 100),
    ("infer_d0_b32_i50", "infer", "efficientdet-d0", 32, 50),
    ("infer_d0_b64_i50", "infer", "efficientdet-d0", 64, 50),
    # fused-MBConv validated-bound probes (VERDICT r3 #2 / r4 #2): the b16
    # probe FAULTED on chip (2026-08-20), so FUSED_MAX_BATCH was lowered to
    # 8 — the largest green batch. Both probes below now exercise the host
    # fence (expected bench_error with the ValueError message, NOT a
    # device fault).
    ("fusedmb_d0_b16", "fusedmb", "efficientdet-d0", 16, 5),
    ("fusedmb_d0_b32", "fusedmb", "efficientdet-d0", 32, 5),
]


def run_one(tag, mode, network, batch, iters, device_note):
    env = dict(os.environ, BENCH_MODE=mode, BENCH_NETWORK=network,
               BENCH_BATCH=str(batch), BENCH_ITERS=str(iters))
    rec = {"tag": tag, "mode": mode, "network": network, "batch": batch,
           "iters": iters, "device": device_note,
           "date": datetime.date.today().isoformat()}
    try:
        proc = subprocess.run([sys.executable,
                               os.path.join(ROOT, "bench.py")],
                              env=env, capture_output=True, text=True,
                              timeout=1800)
    except subprocess.TimeoutExpired as e:
        # record the timeout and keep sweeping the remaining modes
        rec.update({"metric": "bench_error", "value": None,
                    "error": f"timeout after {e.timeout}s"})
        return rec
    line = None
    for ln in proc.stdout.strip().splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    if line is None:
        rec.update({"metric": "bench_error", "value": None,
                    "error": (proc.stderr or proc.stdout)[-500:]})
    else:
        rec.update(json.loads(line))
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default=",".join(t for t, *_ in SWEEP),
                   help="comma-separated sweep tags to run")
    p.add_argument("--out", default=os.path.join(ROOT, "BENCH_MODES.json"))
    args = p.parse_args()
    want = set(args.modes.split(","))

    try:
        import jax
        device_note = str(jax.devices()[0])
    except Exception as e:  # bench.py subprocesses retry on their own
        device_note = f"unknown ({e})"

    records = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            records = [r for r in json.load(f) if r.get("tag") not in want]
    for tag, mode, network, batch, iters in SWEEP:
        if tag not in want:
            continue
        print(f"== {tag} ==", file=sys.stderr)
        rec = run_one(tag, mode, network, batch, iters, device_note)
        print(json.dumps(rec), file=sys.stderr)
        records.append(rec)
        with open(args.out, "w") as f:  # persist after every mode
            json.dump(records, f, indent=1)
    print(f"wrote {args.out} ({len(records)} records)")


if __name__ == "__main__":
    main()
