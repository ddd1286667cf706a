"""Alternate per-level regression/classification subnets.

Parity with the reference's RegressionModel / ClassificationModel
(models/module.py:70-142) — imported by the reference detector but UNUSED
(RetinaHead is the live head; SURVEY.md section 2.1 marks these dead).
Provided so users of that API have a drop-in equivalent: 4 3x3 conv+ReLU
layers, then a 3x3 output conv; classification ends in sigmoid.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvSame

Dtype = Any


class RegressionSubnet(nn.Module):
    in_channels: int
    feature_size: int = 256
    num_anchors: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(4):
            x = nn.relu(ConvSame(self.feature_size, 3, torch_padding=1,
                                 dtype=self.dtype, name=f"conv{i + 1}")(x))
        x = ConvSame(self.num_anchors * 4, 3, torch_padding=1,
                     dtype=self.dtype, name="output")(x)
        return x.reshape(x.shape[0], -1, 4)


class ClassificationSubnet(nn.Module):
    in_channels: int
    num_classes: int
    feature_size: int = 256
    num_anchors: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(4):
            x = nn.relu(ConvSame(self.feature_size, 3, torch_padding=1,
                                 dtype=self.dtype, name=f"conv{i + 1}")(x))
        x = ConvSame(self.num_anchors * self.num_classes, 3, torch_padding=1,
                     dtype=self.dtype, name="output")(x)
        x = jax.nn.sigmoid(x)
        return x.reshape(x.shape[0], -1, self.num_classes)
