"""EfficientNet feature backbone (flax.linen, NHWC).

Parity with reference models/efficientnet.py:18-277 under the reference's
detection-oriented modification: every stage after the first downsamples
(see config._BASE_BLOCKS), so the 7 stage outputs form a stride
2,4,8,16,32,64,128 pyramid and the last five are P3..P7.

TPU-first notes:
- depthwise conv lowers to lax.conv_general_dilated with
  feature_group_count=channels; XLA fuses BN+swish into it.
- squeeze-excite's global mean + two 1x1 convs are pure VPU/MXU work on a
  (B,1,1,C) tensor — no adaptive-pool op needed.
- stochastic depth (drop_connect) rate scales linearly with block index,
  like reference models/efficientnet.py:200-202.
- optional jax.checkpoint (remat) per block for D5-D7 activation memory.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import BlockArgs, GlobalParams, get_model_params, round_filters
from .layers import BatchNorm, ConvSame, drop_connect, swish

Dtype = Any


class MBConvBlock(nn.Module):
    """Mobile inverted residual bottleneck (reference models/efficientnet.py:18-109).

    expand 1x1 -> BN -> swish -> depthwise kxk -> BN -> swish -> SE ->
    project 1x1 -> BN, with id-skip + drop-connect when shapes allow.
    """

    block_args: BlockArgs
    nominal_size: int
    drop_connect_rate: float = 0.0
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    bn_mode: str = "frozen"
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ba = self.block_args
        inputs = x
        expanded = ba.input_filters * ba.expand_ratio

        def bn(name):
            return BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                             mode=self.bn_mode, axis_name=self.bn_axis_name,
                             dtype=self.dtype, name=name)

        if ba.expand_ratio != 1:
            x = ConvSame(expanded, 1, use_bias=False, dtype=self.dtype,
                         nominal_size=self.nominal_size, name="expand_conv")(x)
            x = swish(bn("bn0")(x, train))

        x = ConvSame(expanded, ba.kernel_size, stride=ba.stride, groups=expanded,
                     use_bias=False, dtype=self.dtype,
                     nominal_size=self.nominal_size, name="depthwise_conv")(x)
        x = swish(bn("bn1")(x, train))

        if ba.se_ratio is not None and 0 < ba.se_ratio <= 1:
            squeezed = max(1, int(ba.input_filters * ba.se_ratio))
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = ConvSame(squeezed, 1, dtype=self.dtype,
                         nominal_size=self.nominal_size, name="se_reduce")(s)
            s = ConvSame(expanded, 1, dtype=self.dtype,
                         nominal_size=self.nominal_size,
                         name="se_expand")(swish(s))
            x = jax.nn.sigmoid(s) * x

        x = ConvSame(ba.output_filters, 1, use_bias=False, dtype=self.dtype,
                     nominal_size=self.nominal_size, name="project_conv")(x)
        x = bn("bn2")(x, train)

        if ba.id_skip and ba.stride == 1 and ba.input_filters == ba.output_filters:
            if train and self.drop_connect_rate > 0:
                x = drop_connect(x, self.make_rng("dropout"),
                                 self.drop_connect_rate)
            x = x + inputs
        return x


class EfficientNetFeatures(nn.Module):
    """Stem + MBConv stages; returns one feature map per stage (7 total).

    Mirrors reference extract_features (models/efficientnet.py:190-209): the
    output is collected after the last block of each stage.
    """

    model_name: str = "efficientnet-b0"
    bn_mode: str = "frozen"
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    remat: bool = False   # jax.checkpoint each block (D5-D7 memory relief)

    def setup(self):
        blocks_args, gp = get_model_params(self.model_name)
        self._stage_args = blocks_args
        self._gp = gp
        stem_filters = round_filters(32, gp.width_coefficient, gp.depth_divisor,
                                     gp.min_depth)
        self.conv_stem = ConvSame(stem_filters, 3, stride=2, use_bias=False,
                                  dtype=self.dtype, nominal_size=gp.image_size,
                                  name="conv_stem")
        self.bn0 = BatchNorm(momentum=gp.batch_norm_momentum,
                             epsilon=gp.batch_norm_epsilon, mode=self.bn_mode,
                             axis_name=self.bn_axis_name, dtype=self.dtype,
                             name="bn0")
        total_blocks = sum(b.num_repeat for b in blocks_args)
        block_cls = MBConvBlock
        if self.remat:
            # train flag is arg 2 (self=0, x=1); keep it static under remat.
            block_cls = nn.remat(MBConvBlock, static_argnums=(2,))
        blocks = []
        for stage_args in blocks_args:
            for i in range(stage_args.num_repeat):
                ba = stage_args
                if i > 0:  # repeats keep channels, stride 1 (reference :161-166)
                    ba = dataclasses.replace(
                        ba, input_filters=ba.output_filters, stride=1,
                        num_repeat=1)
                idx = len(blocks)
                # drop-connect rate scales linearly with depth (reference
                # models/efficientnet.py:200-202).
                rate = gp.drop_connect_rate * idx / total_blocks
                blocks.append(block_cls(
                    block_args=ba, nominal_size=gp.image_size,
                    drop_connect_rate=rate,
                    bn_momentum=gp.batch_norm_momentum,
                    bn_epsilon=gp.batch_norm_epsilon,
                    bn_mode=self.bn_mode, bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype, name=f"block_{idx}"))
        self.blocks = blocks

    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        x = swish(self.bn0(self.conv_stem(x), train))
        features = []
        idx = 0
        for stage_args in self._stage_args:
            for _ in range(stage_args.num_repeat):
                x = self.blocks[idx](x, train)
                idx += 1
            features.append(x)
        return features

    @property
    def feature_channels(self) -> List[int]:
        """Per-stage output channels (reference get_list_features,
        models/efficientnet.py:263-268)."""
        return [b.output_filters for b in self._stage_args]


def backbone_feature_channels(model_name: str) -> List[int]:
    """Stage channels without building the module."""
    blocks_args, _ = get_model_params(model_name)
    return [b.output_filters for b in blocks_args]
