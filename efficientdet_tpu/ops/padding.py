"""TF-style SAME padding, computed statically.

The reference uses ``Conv2dStaticSamePadding`` (models/utils.py:126-155): the
asymmetric TF-SAME padding is computed once from the *nominal* ImageNet image
size in ``global_params.image_size`` (224 for B0, ... 528 for B6) — NOT from
the actual detection input (512, 640, ...). Because all nominal sizes and all
detection sizes are even, and feature maps stay even through the stride-2
chain, the resulting pads are identical in practice; we replicate the exact
rule so imported PyTorch weights are bit-compatible.

On TPU we hand the explicit ``((lo, hi), (lo, hi))`` pad pair straight to
``lax.conv_general_dilated`` — no runtime shape inspection, no dynamic pads,
fully static for XLA.
"""

from __future__ import annotations

import math
from typing import Tuple


def same_padding_1d(size: int, kernel: int, stride: int,
                    dilation: int = 1) -> Tuple[int, int]:
    """TF-SAME (lo, hi) padding for one spatial dim of nominal length `size`.

    Matches reference models/utils.py:138-147: total pad
    ``max((ceil(size/stride)-1)*stride + (kernel-1)*dilation + 1 - size, 0)``
    split as (pad//2, pad - pad//2).
    """
    out = math.ceil(size / stride)
    pad = max((out - 1) * stride + (kernel - 1) * dilation + 1 - size, 0)
    return pad // 2, pad - pad // 2


def same_padding(image_size: int, kernel: int, stride: int,
                 dilation: int = 1) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Static SAME padding for a square input; (H-pads, W-pads)."""
    p = same_padding_1d(image_size, kernel, stride, dilation)
    return p, p
