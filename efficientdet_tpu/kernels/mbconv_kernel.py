"""Pallas TPU kernel: fused MBConv expand + depthwise stage.

The MBConv hot path (reference models/efficientnet.py:75-105) is
``expand 1x1 conv -> BN -> swish -> depthwise KxK -> BN -> swish -> SE``.
Under XLA the expanded tensor is materialized in HBM between the expand and
depthwise convs — at D0@512 B=128 that is 1.6 GB written + 1.6 GB re-read
for block_1 alone, and the depthwise convs profile as the largest
memory-bound cost in the backbone (~17 ms of an 84 ms serving step).

This kernel computes the whole segment with the expanded activation
resident in VMEM:

    y  = swish(scale0 * (x @ W_expand) + bias0)        # per row-tile
    z  = swish(scale1 * depthwise_KxK_s(y) + bias1)    # shifted-add form
    se = mean(z, spatial)                              # emitted for the SE

- grid (B, H-tiles): the (1, Hp, Wp, Cin) input block is fetched once per
  image (the index map is t-invariant, so Pallas keeps it across tiles) and
  each step writes one (TO, Wo, Ce) output tile.
- the depthwise conv is K*K unrolled shifted multiply-adds; stride 2 is a
  split-reshape + phase-select on the sublane/outer dims (Mosaic supports
  splitting into the sublane dim, not merging).
- scale/bias are the frozen-BN affines folded outside
  (``fold_bn_affine``); SAME padding asymmetry (ops/padding.py) is
  reproduced exactly: the input arrives zero-padded and the kernel masks
  the expanded activation (swish(bias0) != 0 at padded positions) back to
  zero before the depthwise window.

Numerics: bf16 in/out, f32 accumulation — matching the XLA path within
bf16 rounding (verified in interpret mode across k3/k5 x s1/s2 and on a
real v5e chip).

STATUS — measured A/B on v5e at block_1's shape (B=128, 256x256, 16->96,
k3 s2): this kernel 80 ms vs 12.6 ms for the XLA expand+depthwise pair.
The bandwidth saved by keeping the expanded tensor in VMEM is swamped by
Mosaic's lowering of the K=16 matmul (no MXU-efficient shape) and the
per-tap phase reshapes. XLA's specialized depthwise emitters
(EmitDepthwiseAllBatchInLanes) remain the production path; this kernel is
kept as the verified scaffold for future MXU-friendly restructuring
(flattened-row matmul, lane-shift taps) and is NOT wired into the model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.padding import same_padding_1d


def fold_bn_affine(gamma, beta, mean, var, epsilon: float):
    """Frozen-BN as an affine: y = x * scale + bias (f32)."""
    scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + epsilon)
    bias = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return scale, bias


def _kernel(x_ref, we_ref, a0_ref, wd_ref, a1_ref, out_ref, se_ref,
            se_acc, *, k: int, stride: int, tile_o: int,
            pt: int, pl_: int, in_h: int, in_w: int, out_h: int, out_w: int,
            num_tiles: int):
    t = pl.program_id(1)
    # tap slices below read stride-aligned windows of length tile_o*stride,
    # so the halo is (stride-1) wider than the minimal (tile_o-1)*stride+k
    ri = tile_o * stride + k - 1
    r0 = t * tile_o * stride
    xs = x_ref[0, 0]                                    # (RI, Wp, Cin)
    wp = xs.shape[1]
    ce = we_ref.shape[1]

    y = jax.lax.dot_general(
        xs, we_ref[:, :], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (RI, Wp, Ce)
    y = y * a0_ref[0, :][None, None, :] + a0_ref[1, :][None, None, :]
    y = y * jax.nn.sigmoid(y)

    # zero the padding ring (global input row/col outside [0, H)/[0, W)).
    # Expressed as two broadcast multiplies with (RI,1,1)/(1,Wp,1) masks —
    # a full (RI, Wp, 1) iota/select lane-pads 1 -> 128 and costs ~5 MB of
    # VMEM stack per int32 temporary.
    io_r = r0 + jax.lax.broadcasted_iota(jnp.int32, (ri, 1, 1), 0)
    io_c = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    # bf16 like the XLA path's materialized expand output; keeps the tap
    # working set small in VMEM.
    y = y.astype(x_ref.dtype)
    y = y * ((io_r >= pt) & (io_r < pt + in_h)).astype(y.dtype)
    y = y * ((io_c >= pl_) & (io_c < pl_ + in_w)).astype(y.dtype)

    acc = jnp.zeros((tile_o, out_w, ce), jnp.float32)
    for di in range(k):
        rows_k = y[di:di + tile_o * stride]
        if stride == 2:
            rows_k = rows_k.reshape(tile_o, 2, wp, ce)[:, 0]
        # extract column phases once per tap row; per-dj windows are then
        # plain static slices (no per-tap reshape copies).
        if stride == 2:
            half = wp // 2
            rphase = rows_k.reshape(tile_o, half, 2, ce)
            phases = (rphase[:, :, 0, :], rphase[:, :, 1, :])
        for dj in range(k):
            if stride == 2:
                win = phases[dj % 2][:, dj // 2:dj // 2 + out_w, :]
            else:
                win = rows_k[:, dj:dj + out_w, :]
            acc = acc + win.astype(jnp.float32) * \
                wd_ref[di * k + dj, :][None, None, :]

    z = acc * a1_ref[0, :][None, None, :] + a1_ref[1, :][None, None, :]
    z = z * jax.nn.sigmoid(z)
    out_ref[0] = z.astype(out_ref.dtype)

    tile_sum = jnp.sum(z, axis=(0, 1))[None, :]         # (1, Ce)

    @pl.when(t == 0)
    def _init():
        se_acc[:, :] = jnp.zeros_like(se_acc)

    se_acc[:, :] += tile_sum

    @pl.when(t == num_tiles - 1)
    def _emit():
        se_ref[0, :, :] = se_acc[:, :] / float(out_h * out_w)


# --------------------------------------------------------------------------
# v2: flattened-row formulation (MXU-friendly restructure of the kernel
# above; see VERDICT round-1 item 4 and docs/DESIGN.md).
#
# Three structural changes vs the kernel above:
#
# 1. FLAT ROWS. XLA pre-flattens each input tile to a 2-D (R, Cin+1) array
#    (R = phases * tile_rows * padded_width), so the expand conv is ONE
#    plain 2-D matmul (R, Cin+1) @ (Cin+1, Ce) — no 3-D dot_general for
#    Mosaic to lower badly — and every depthwise tap becomes a STATIC
#    sublane-shifted slice y[start : start + tile_o*Wq] of the flattened
#    array: zero reshapes/copies inside the tap loop.
# 2. PHASE SPLIT OUTSIDE. For stride 2 the padded input is deinterleaved
#    into s*s spatial phases by XLA (cheap HBM-level copy of the SMALL
#    pre-expansion tensor); tap (di, dj) then reads phase
#    (di%s, dj%s) at flat offset (di//s)*Wq + dj//s — again a static
#    slice, replacing the per-tap phase reshapes that dominated v1's cost.
# 3. BIAS AS INPUT CHANNEL. The BN0 affine is folded INTO the matmul:
#    W' = W_expand * scale0 (per out-channel), plus one extra input
#    channel holding the valid-pixel mask with weight row bias0, so
#    y_pre = scale0*(x@W) + bias0 at real pixels and EXACTLY 0 at padding
#    (swish(0) = 0) — padding correctness costs zero kernel ops instead of
#    v1's iota/select masking.
#
# The accumulator runs at full padded width Wq per output row (garbage
# right-edge columns are cut by the final static slice) so the k*k tap
# loop is k*k fused multiply-adds over one (tile_o*Wq, Ce) tile.
# --------------------------------------------------------------------------


def _kernel_flat(x_ref, we_ref, wd_ref, a1_ref, out_ref, se_ref, se_acc, *,
                 k: int, stride: int, tile_o: int, ti: int, wq: int,
                 blk: int, out_w: int, out_h: int, num_tiles: int):
    t = pl.program_id(1)
    xs = x_ref[0, 0]                                     # (R, Cin+1)
    y = jax.lax.dot_general(
        xs, we_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (R, Ce)
    y = y * jax.nn.sigmoid(y)                            # swish; 0 at pads
    # bf16 like the XLA path's materialized expand output (and halves the
    # tap-loop read bandwidth); accumulate back in f32.
    y = y.astype(x_ref.dtype)

    ce = we_ref.shape[1]
    acc = jnp.zeros((tile_o * wq, ce), jnp.float32)
    for di in range(k):
        for dj in range(k):
            p = (di % stride) * stride + (dj % stride)
            start = p * blk + (di // stride) * wq + (dj // stride)
            win = jax.lax.slice_in_dim(y, start, start + tile_o * wq, axis=0)
            acc = acc + win.astype(jnp.float32) * \
                wd_ref[di * k + dj, :][None, :]

    z = acc * a1_ref[0, :][None, :] + a1_ref[1, :][None, :]
    z = z * jax.nn.sigmoid(z)
    z3 = z.reshape(tile_o, wq, ce)[:, :out_w, :]         # split + cut garbage
    out_ref[0] = z3.astype(out_ref.dtype)

    tile_sum = jnp.sum(z3, axis=(0, 1))[None, :]         # (1, Ce)

    @pl.when(t == 0)
    def _init():
        se_acc[:, :] = jnp.zeros_like(se_acc)

    se_acc[:, :] += tile_sum

    @pl.when(t == num_tiles - 1)
    def _emit():
        se_ref[0, :, :] = se_acc[:, :] / float(out_h * out_w)


@functools.partial(jax.jit, static_argnames=("stride", "interpret", "tile_o"))
def fused_expand_dw_flat(x: jnp.ndarray,          # (B, H, W, Cin)
                         w_expand: jnp.ndarray,   # (Cin, Ce)
                         scale0: jnp.ndarray, bias0: jnp.ndarray,
                         w_dw: jnp.ndarray,       # (K, K, Ce)
                         scale1: jnp.ndarray, bias1: jnp.ndarray,
                         stride: int = 1,
                         tile_o: int = 8,
                         interpret: bool = False):
    """v2 of `fused_expand_dw` (see block comment above): same contract,
    -> (z (B, Ho, Wo, Ce) x.dtype, se_mean (B, Ce) f32)."""
    b, h, w, cin = x.shape
    k = w_dw.shape[0]
    ce = w_expand.shape[1]
    s = stride
    out_h = -(-h // s)
    out_w = -(-w // s)
    e = (k - 1) // s                      # extra halo rows/cols per phase
    pt, _ = same_padding_1d(h, k, s)
    pl_pad, _ = same_padding_1d(w, k, s)

    while out_h % tile_o:
        tile_o //= 2
    num_tiles = out_h // tile_o
    ti = tile_o + e                       # phase rows per tile
    wq = -(-(out_w + e) // 8) * 8         # phase width, sublane-aligned
    hq = out_h + e                        # phase rows total

    # pad to exactly s*s phases of (hq, wq); mask channel marks real pixels
    xm = jnp.concatenate(
        [x, jnp.ones((b, h, w, 1), x.dtype)], axis=-1)
    x_pad = jnp.pad(xm, ((0, 0), (pt, s * hq - h - pt),
                         (pl_pad, s * wq - w - pl_pad), (0, 0)))
    phases = [x_pad[:, pr::s, pc::s, :]           # each (B, hq, wq, Cin+1)
              for pr in range(s) for pc in range(s)]
    # tile rows with duplicated halos; flatten (rows, wq) per phase. Each
    # phase slab gets 8 zero rows of tail slack so the last tap's
    # (dj//s)-shifted slice (≤ e ≤ 4 entries past ti*wq) stays in bounds.
    blk = ti * wq + 8
    tiles = []
    for t in range(num_tiles):
        slabs = [jnp.pad(
            jax.lax.slice_in_dim(p, t * tile_o, t * tile_o + ti, axis=1)
            .reshape(b, ti * wq, cin + 1), ((0, 0), (0, 8), (0, 0)))
            for p in phases]
        tiles.append(jnp.concatenate(slabs, axis=1))  # (B, P*blk, Cin+1)
    x_tiles = jnp.stack(tiles, axis=1)        # (B, NT, R, Cin+1)
    r_rows = s * s * blk

    dtype = x.dtype
    # fold BN0 scale into the matmul; bias rides the mask channel
    w_folded = jnp.concatenate(
        [w_expand.astype(jnp.float32) * scale0[None, :],
         bias0[None, :]], axis=0).astype(dtype)         # (Cin+1, Ce)
    weights = [
        w_folded,
        w_dw.reshape(k * k, ce).astype(jnp.float32),
        jnp.stack([scale1, bias1]).astype(jnp.float32),
    ]
    z, se = pl.pallas_call(
        functools.partial(_kernel_flat, k=k, stride=s, tile_o=tile_o,
                          ti=ti, wq=wq, blk=blk, out_w=out_w, out_h=out_h,
                          num_tiles=num_tiles),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, r_rows, cin + 1), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin + 1, ce), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, ce), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ce), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_o, out_w, ce), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ce), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, out_h, out_w, ce), dtype),
            jax.ShapeDtypeStruct((b, 1, ce), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, ce), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_tiles, *weights)
    return z, se[:, 0, :]


@functools.partial(jax.jit, static_argnames=("stride", "interpret", "tile_o"))
def fused_expand_dw(x: jnp.ndarray,          # (B, H, W, Cin)
                    w_expand: jnp.ndarray,   # (Cin, Ce)
                    scale0: jnp.ndarray, bias0: jnp.ndarray,   # (Ce,) f32
                    w_dw: jnp.ndarray,       # (K, K, Ce)
                    scale1: jnp.ndarray, bias1: jnp.ndarray,   # (Ce,) f32
                    stride: int = 1,
                    tile_o: int = 8,
                    interpret: bool = False):
    """-> (z (B, Ho, Wo, Ce) x.dtype, se_mean (B, Ce) f32). See module doc."""
    b, h, w, cin = x.shape
    k = w_dw.shape[0]
    ce = w_expand.shape[1]
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pt, pb = same_padding_1d(h, k, stride)
    pl_pad, pr = same_padding_1d(w, k, stride)

    while out_h % tile_o:
        tile_o //= 2
    num_tiles = out_h // tile_o

    hp = out_h * stride + k - 1
    wp = out_w * stride + k - 1
    x_pad = jnp.pad(x, ((0, 0), (pt, hp - h - pt), (pl_pad, wp - w - pl_pad),
                        (0, 0)))
    # Pre-tile the rows with duplicated halos so pallas blocks don't overlap
    # (BlockSpec can't express halo reads, and low-Cin VMEM blocks lane-pad
    # 16 -> 128, so whole-image residency is 8x too large). One extra XLA
    # copy (~RI/TO*s overhead) buys a clean (1, 1, RI, Wp, Cin) block.
    ri = tile_o * stride + k - 1
    x_tiles = jnp.stack(
        [jax.lax.slice_in_dim(x_pad, t * tile_o * stride,
                              t * tile_o * stride + ri, axis=1)
         for t in range(num_tiles)], axis=1)     # (B, NT, RI, Wp, Cin)

    dtype = x.dtype
    weights = [
        w_expand.astype(dtype),
        jnp.stack([scale0, bias0]).astype(jnp.float32),
        w_dw.reshape(k * k, ce).astype(jnp.float32),
        jnp.stack([scale1, bias1]).astype(jnp.float32),
    ]
    z, se = pl.pallas_call(
        functools.partial(_kernel, k=k, stride=stride, tile_o=tile_o,
                          pt=pt, pl_=pl_pad, in_h=h, in_w=w,
                          out_h=out_h, out_w=out_w, num_tiles=num_tiles),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, ri, wp, cin), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, ce), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ce), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, ce), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ce), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_o, out_w, ce), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ce), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, out_h, out_w, ce), dtype),
            jax.ShapeDtypeStruct((b, 1, ce), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, ce), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # the tap-unroll working set peaks above the 16 MB default
            # scoped-vmem budget at 256x256 inputs; v5e VMEM accommodates it
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_tiles, *weights)
    return z, se[:, 0, :]
