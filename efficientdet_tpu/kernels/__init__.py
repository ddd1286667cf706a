"""Pallas TPU kernels: BiFPN fusion, greedy NMS, fused MBConv scaffold."""

from .mbconv_kernel import fold_bn_affine, fused_expand_dw
from .nms_kernel import nms_select_pallas
from .fusion import (fuse_bottomup_pallas, fuse_bottomup_xla,
                     fuse_topdown_pallas, fuse_topdown_xla)

__all__ = ["fuse_bottomup_pallas", "fuse_bottomup_xla",
           "fuse_topdown_pallas", "fuse_topdown_xla",
           "fold_bn_affine", "fused_expand_dw", "nms_select_pallas"]
