"""Pallas TPU kernels for BiFPN fast-normalized fusion nodes.

The BiFPN fusion nodes are memory-bound elementwise work: a x2 nearest
upsample (top-down) or 2x2 max pool (bottom-up) feeding a weighted average
(reference models/bifpn.py:188-202). XLA usually fuses these into the
following conv; these kernels guarantee the fusion: one VMEM pass computes
the resize + weighted add + normalization without materializing the resized
tensor in HBM.

Layout: NHWC. The grid tiles over (batch, H-of-the-larger-map); each program
reads a (TH, W, C) tile of the large map and the matching (TH/2, W/2, C) tile
of the small map, and writes one fused tile. C and W are the lane/sublane
dims XLA:TPU tiles natively.

Both kernels have jnp reference implementations (`*_xla`) used as fallbacks
and in tests (pallas interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """(h, w, c) -> (2h, 2w, c) nearest.

    jnp.repeat lowers cleanly in Mosaic; the broadcast+reshape alternative
    hits "infer-vector-layout: unsupported shape cast" (merging into the
    sublane dim is not supported, splitting is).
    """
    return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    """(2h, 2w, c) -> (h, w, c) max."""
    h2, w2, c = x.shape
    x = x.reshape(h2 // 2, 2, w2 // 2, 2, c)
    return jnp.max(x, axis=(1, 3))


# ------------------------------------------------------------- top-down
def fuse_topdown_xla(big: jnp.ndarray, small: jnp.ndarray,
                     w0: jnp.ndarray, w1: jnp.ndarray,
                     eps: float = 1e-4) -> jnp.ndarray:
    """(w0*big + w1*up2(small)) / (w0 + w1 + eps); big (B,2h,2w,C), small (B,h,w,C)."""
    up = jax.vmap(_upsample2)(small)
    return (w0 * big + w1 * up) / (w0 + w1 + eps)


def _topdown_kernel(w_ref, big_ref, small_ref, out_ref, *, eps):
    # Mosaic's sublane repeat/reshape only supports 32-bit vectors; do the
    # resize + fusion math in f32 and cast at the boundary.
    w0 = w_ref[0, 0]
    w1 = w_ref[0, 1]
    up = _upsample2(small_ref[0].astype(jnp.float32))
    big = big_ref[0].astype(jnp.float32)
    out_ref[0] = ((w0 * big + w1 * up) / (w0 + w1 + eps)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "tile_h"))
def fuse_topdown_pallas(big: jnp.ndarray, small: jnp.ndarray,
                        w0: jnp.ndarray, w1: jnp.ndarray, eps: float = 1e-4,
                        tile_h: int = 16, interpret: bool = False
                        ) -> jnp.ndarray:
    b, h2, w2, c = big.shape
    th = min(tile_h, h2)
    while h2 % th:
        th //= 2
    th = max(th, 2)
    weights = jnp.stack([w0, w1]).reshape(1, 2).astype(jnp.float32)
    grid = (b, h2 // th)
    return pl.pallas_call(
        functools.partial(_topdown_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th, w2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th // 2, w2 // 2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(big.shape, big.dtype),
        interpret=interpret,
    )(weights, big, small.astype(big.dtype))


# ------------------------------------------------------------ bottom-up
def fuse_bottomup_xla(cur: jnp.ndarray, lower: jnp.ndarray,
                      skip: jnp.ndarray, w0: jnp.ndarray, w1: jnp.ndarray,
                      w2: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """(w0*cur + w1*maxpool2(lower) + w2*skip) / (w0+w1+w2+eps);
    cur/skip (B,h,w,C), lower (B,2h,2w,C)."""
    pooled = jax.vmap(_maxpool2)(lower)
    return (w0 * cur + w1 * pooled + w2 * skip) / (w0 + w1 + w2 + eps)


def _bottomup_kernel(w_ref, cur_ref, lower_ref, skip_ref, out_ref, *, eps):
    w0 = w_ref[0, 0]
    w1 = w_ref[0, 1]
    w2 = w_ref[0, 2]
    pooled = _maxpool2(lower_ref[0].astype(jnp.float32))
    cur = cur_ref[0].astype(jnp.float32)
    skip = skip_ref[0].astype(jnp.float32)
    out_ref[0] = ((w0 * cur + w1 * pooled + w2 * skip)
                  / (w0 + w1 + w2 + eps)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "tile_h"))
def fuse_bottomup_pallas(cur: jnp.ndarray, lower: jnp.ndarray,
                         skip: jnp.ndarray, w0: jnp.ndarray, w1: jnp.ndarray,
                         w2: jnp.ndarray, eps: float = 1e-4,
                         tile_h: int = 8, interpret: bool = False
                         ) -> jnp.ndarray:
    b, h, w, c = cur.shape
    th = min(tile_h, h)
    while h % th:
        th //= 2
    th = max(th, 1)
    weights = jnp.stack([w0, w1, w2]).reshape(1, 3).astype(jnp.float32)
    grid = (b, h // th)
    return pl.pallas_call(
        functools.partial(_bottomup_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * th, 2 * w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        interpret=interpret,
    )(weights, cur, lower.astype(cur.dtype), skip.astype(cur.dtype))
