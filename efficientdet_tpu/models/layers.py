"""Shared NN building blocks (NHWC, static shapes, TPU-friendly).

Replaces reference models/utils.py (SAME-pad convs, swish) and
models/module.py:276-516 (ConvModule, norm registry). Key TPU-first choices:

- NHWC everywhere: the channels-last layout is what XLA:TPU tiles best onto
  the MXU/VPU; it also removes the reference head's permute+reshape dance
  (models/retinahead.py:120-128) — flattening NHWC is already anchor-order.
- SAME padding is a compile-time constant handed to the conv op (see
  ops/padding.py) — no runtime shape inspection.
- BatchNorm supports the reference's frozen semantics (running stats used in
  training too — models/efficientdet.py:54,88-92) plus trainable and
  cross-replica ("SyncBN", models/module.py:352-358) modes; the sync variant
  averages batch stats over the mesh data axis via BatchNorm's axis_name.
- MemoryEfficientSwish (models/utils.py:31-47, a hand-written autograd
  backward to save memory) is unnecessary under XLA: swish is jax.nn.silu and
  rematerialization is handled by jax.checkpoint at the block level.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.padding import same_padding

Dtype = Any

# Reference init: normal(0, sqrt(2/n)), n = kh*kw*out (efficientdet.py:47-50).
he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_uniform = nn.initializers.xavier_uniform()


class ConvSame(nn.Module):
    """2D conv with static TF-SAME padding (reference Conv2dStaticSamePadding).

    `nominal_size` is the image size the padding is derived from — the
    backbone uses the ImageNet resolution from GlobalParams (the reference's
    quirk, models/utils.py:126-149), everything else uses symmetric torch-style
    padding via `torch_padding`.
    """

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    nominal_size: Optional[int] = None    # TF-SAME from this size
    torch_padding: Optional[int] = None   # symmetric pad (torch Conv2d style)
    dtype: Dtype = jnp.float32
    kernel_init: Callable = he_normal_fan_out

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.nominal_size is not None:
            padding: Any = same_padding(self.nominal_size, self.kernel_size,
                                        self.stride)
        elif self.torch_padding is not None:
            p = (self.torch_padding, self.torch_padding)
            padding = (p, p)
        else:
            padding = ((0, 0), (0, 0))
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=padding,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with frozen / train / sync modes.

    - frozen: always normalize with running stats (reference freeze_bn +
      train.py:102 — BN stats never update during training)
    - train:  standard BN (stats update when `train=True`)
    - sync:   like train, but batch stats are averaged across `axis_name`
      (the mesh data axis) — the reference's latent SyncBN capability.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    mode: str = "frozen"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.mode == "frozen":
            use_running_average = True
        elif self.mode in ("train", "sync"):
            use_running_average = not train
        else:
            raise ValueError(f"unknown bn mode: {self.mode}")
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name if self.mode == "sync" else None,
            name="bn",
        )(x)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (reference models/utils.py:31-52)."""
    return jax.nn.silu(x)


class ConvWS(nn.Module):
    """Weight-standardized conv (reference ConvWS2d, models/module.py:276-316):
    kernel standardized per output channel (mean/std over in x kh x kw,
    eps added to std) before the convolution."""

    features: int
    kernel_size: int
    stride: int = 1
    torch_padding: int = 0
    use_bias: bool = True
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    kernel_init: Callable = he_normal_fan_out

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, in_features, self.features), jnp.float32)
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / (std + self.eps)
        p = (self.torch_padding, self.torch_padding)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride), padding=(p, p),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def build_norm(norm_type: Optional[str], *, momentum: float = 0.99,
               epsilon: float = 1e-5, num_groups: int = 32,
               axis_name: Optional[str] = None, dtype: Dtype = jnp.float32,
               name: str = "norm"):
    """Norm registry (reference norm_cfg, models/module.py:352-402):
    'BN' | 'SyncBN' | 'GN' | None. Returns a callable (x, train) -> x."""
    if norm_type is None:
        return lambda x, train: x
    if norm_type in ("BN", "SyncBN"):
        mode = "sync" if norm_type == "SyncBN" else "train"
        bn = BatchNorm(momentum=momentum, epsilon=epsilon, mode=mode,
                       axis_name=axis_name, dtype=dtype, name=name)
        return bn
    if norm_type == "GN":
        gn = nn.GroupNorm(num_groups=num_groups, epsilon=epsilon,
                          dtype=dtype, param_dtype=jnp.float32, name=name)
        return lambda x, train: gn(x)
    raise KeyError(f"Unrecognized norm type {norm_type}")


def drop_connect(x: jnp.ndarray, rng: jax.Array, rate: float) -> jnp.ndarray:
    """Stochastic depth: drop the whole residual per sample, rescale survivors.

    Matches reference models/utils.py:79-90: binary = floor(keep + U[0,1)),
    out = x / keep * binary.
    """
    keep = 1.0 - rate
    batch = x.shape[0]
    u = jax.random.uniform(rng, (batch,) + (1,) * (x.ndim - 1), dtype=x.dtype)
    binary = jnp.floor(keep + u)
    return x / keep * binary


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest-neighbor x2 (reference F.interpolate, bifpn.py:189).

    Implemented as repeat — exact for integer scale and cheap on the VPU.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 2x2/2 VALID max pool (reference F.max_pool2d(x, 2), bifpn.py:195)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID")


def upsample_nearest_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest upsample of a coarser level to an exact (h, w) target.

    BiFPN's top-down resize must hit the lateral level's *actual* shape.
    At the production D0-D6 geometries (all-even pyramids) the target is
    exactly 2x and this is identical to ``upsample_nearest_2x`` — parity
    with the reference's ``F.interpolate(scale_factor=2)``. At the odd
    geometries the backbone's nominal-size static-SAME quirk produces
    (e.g. D7@1636: 25 <- 12 — where the reference model itself crashes,
    see docs/DESIGN.md), the target is 2H-1 (crop one row/col of the
    repeat) or 2H+1 (jax.image nearest resize). Shapes are static at trace
    time, so the even path stays a gather-free reshape-broadcast."""
    hh, ww = 2 * x.shape[1], 2 * x.shape[2]
    if (h, w) == (hh, ww):
        return upsample_nearest_2x(x)
    if h <= hh and w <= ww:
        return upsample_nearest_2x(x)[:, :h, :w, :]
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="nearest")


def max_pool_2x2_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """2x2/2 max pool of a finer level to an exact (h, w) target.

    floor targets (torch ``F.max_pool2d(x, 2)`` semantics — the reference's
    downsample, bifpn.py:195, and every even production geometry) use a
    VALID pool; ceil targets pad the bottom/right edge with -inf (SAME);
    anything else — possible only under the backbone's nominal-size
    static-SAME quirk at off-spec input sizes — max-pools VALID and nearest
    -resizes the remainder. Even inputs take the first branch, so
    weight-import parity is untouched."""
    H, W = x.shape[1], x.shape[2]
    pad_h, pad_w = 2 * h - H, 2 * w - W
    if 0 <= pad_h <= 1 and 0 <= pad_w <= 1:
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1),
            padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    y = max_pool_2x2(x)
    b, _, _, c = y.shape
    return jax.image.resize(y, (b, h, w, c), method="nearest")


def max_pool_1x1_stride2(x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 subsample (reference F.max_pool2d(x, 1, stride=2), bifpn.py:116)."""
    return x[:, ::2, ::2, :]
