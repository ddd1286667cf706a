"""Pallas TPU kernels (BiFPN fusion; more as profiling justifies)."""

from .fusion import (fuse_bottomup_pallas, fuse_bottomup_xla,
                     fuse_topdown_pallas, fuse_topdown_xla)

__all__ = ["fuse_bottomup_pallas", "fuse_bottomup_xla",
           "fuse_topdown_pallas", "fuse_topdown_xla"]
