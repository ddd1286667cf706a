#!/usr/bin/env python
"""A/B the fused MBConv Pallas kernels vs XLA at real D0@512 block shapes.

Protocol per docs/DESIGN.md measurement rules: many back-to-back dispatches
of a >=ms computation, one trailing block_until_ready (per-call wall timing
is unreliable on this rig). Run on the real TPU:

    python tools/bench_mbconv_kernel.py [--batch 128] [--iters 30] \
        [--impl flat|v1|both] [--blocks b1,b2,...]

Prints per-shape XLA-pair vs Pallas times and the projected serving-step
delta if the winner were wired per block.
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# (name, in_spatial, cin, ce, k, s) — every expand+depthwise pair in
# EfficientNet-B0 at 512 px (config.py base blocks; block_0 has no expand)
SHAPES = [
    ("b1", 256, 16, 96, 3, 2),
    ("b2", 128, 24, 144, 3, 1),
    ("b3", 128, 24, 144, 5, 2),
    ("b4", 64, 40, 240, 5, 1),
    ("b5", 64, 40, 240, 5, 2),
    ("b6", 32, 80, 480, 3, 1),     # x2 (b6, b7)
    ("b8", 32, 80, 480, 5, 1),
    ("b9", 32, 112, 672, 5, 1),    # x2 (b9, b10)
    ("b11", 32, 112, 672, 5, 2),
    ("b12", 16, 192, 1152, 5, 1),  # x3 (b12-b14)
    ("b15", 16, 192, 1152, 3, 1),
]
MULTIPLICITY = {"b6": 2, "b9": 2, "b12": 3}


def bench(fn, args, iters):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--impl", default="flat", choices=["flat", "v1", "both"])
    ap.add_argument("--blocks", default="")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from efficientdet_tpu.kernels.mbconv_kernel import (fused_expand_dw,
                                                        fused_expand_dw_flat)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    sel = set(args.blocks.split(",")) if args.blocks else None

    def xla_pair(x, we, s0, b0, wd, s1, b1_, stride):
        y = jnp.einsum("bhwc,ce->bhwe", x, we)
        y = y.astype(jnp.float32) * s0 + b0
        y = (y * jax.nn.sigmoid(y)).astype(dt)
        k = wd.shape[0]
        z = jax.lax.conv_general_dilated(
            y, wd[:, :, None, :].astype(dt), (stride, stride), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                y.shape, (k, k, 1, y.shape[3]), ("NHWC", "HWIO", "NHWC")),
            feature_group_count=y.shape[3])
        z = z.astype(jnp.float32) * s1 + b1_
        z = z * jax.nn.sigmoid(z)
        return z.astype(dt), jnp.mean(z, axis=(1, 2))

    total_xla = total_best = 0.0
    for name, hw, cin, ce, k, s in SHAPES:
        if sel and name not in sel:
            continue
        m = MULTIPLICITY.get(name, 1)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(args.batch, hw, hw, cin), dt)
        we = jnp.asarray(rng.randn(cin, ce) * 0.1, dt)
        s0 = jnp.asarray(rng.rand(ce) + 0.5, jnp.float32)
        b0 = jnp.asarray(rng.randn(ce) * 0.1, jnp.float32)
        wd = jnp.asarray(rng.randn(k, k, ce) * 0.1, jnp.float32)
        s1 = jnp.asarray(rng.rand(ce) + 0.5, jnp.float32)
        b1_ = jnp.asarray(rng.randn(ce) * 0.1, jnp.float32)

        t_xla = bench(jax.jit(xla_pair, static_argnames="stride"),
                      (x, we, s0, b0, wd, s1, b1_, s), args.iters)
        row = f"{name:4s} {hw:3d}px {cin:3d}->{ce:4d} k{k} s{s} x{m}: " \
              f"xla {t_xla * 1e3:7.2f} ms"
        best = t_xla
        impls = {"flat": fused_expand_dw_flat, "v1": fused_expand_dw}
        run = ["flat", "v1"] if args.impl == "both" else [args.impl]
        for iname in run:
            try:
                t_p = bench(
                    lambda *a: impls[iname](*a, stride=s),
                    (x, we, s0, b0, wd, s1, b1_), args.iters)
                row += f" | {iname} {t_p * 1e3:7.2f} ms " \
                       f"({t_xla / t_p:4.2f}x)"
                best = min(best, t_p)
            except Exception as e:  # noqa: BLE001 — report per-shape failure
                row += f" | {iname} FAILED: {type(e).__name__}: {e}"
        print(row, flush=True)
        total_xla += m * t_xla
        total_best += m * best

    print(f"\nsum over blocks: xla {total_xla * 1e3:.2f} ms, "
          f"best-of {total_best * 1e3:.2f} ms "
          f"(saving {(total_xla - total_best) * 1e3:.2f} ms/step @ "
          f"B={args.batch})")


if __name__ == "__main__":
    main()
