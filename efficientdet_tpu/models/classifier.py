"""EfficientNet ImageNet classifier head.

Completes the EfficientNet API surface (reference models/efficientnet.py:
168-182: _conv_head + _bn1 + avg pool + dropout + _fc). Detection never uses
it, but `from_pretrained` checkpoints carry these weights and the reference
class exposes classification; provided for full capability parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import get_model_params, round_filters
from .efficientnet import EfficientNetFeatures
from .layers import BatchNorm, ConvSame, swish

Dtype = Any


class EfficientNetClassifier(nn.Module):
    model_name: str = "efficientnet-b0"
    num_classes: int = 1000
    bn_mode: str = "train"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        blocks_args, gp = get_model_params(self.model_name, self.num_classes)
        features = EfficientNetFeatures(
            model_name=self.model_name, bn_mode=self.bn_mode,
            dtype=self.dtype, name="features")(x, train)
        h = features[-1]
        head_ch = round_filters(1280, gp.width_coefficient, gp.depth_divisor,
                                gp.min_depth)
        h = ConvSame(head_ch, 1, use_bias=False, dtype=self.dtype,
                     nominal_size=gp.image_size, name="conv_head")(h)
        h = swish(BatchNorm(momentum=gp.batch_norm_momentum,
                            epsilon=gp.batch_norm_epsilon, mode=self.bn_mode,
                            dtype=self.dtype, name="bn1")(h, train))
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        if train and gp.dropout_rate:
            h = nn.Dropout(rate=gp.dropout_rate, deterministic=False)(h)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc")(h)
