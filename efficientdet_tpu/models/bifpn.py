"""BiFPN neck with fast-normalized weighted fusion (flax.linen, NHWC).

Parity with reference models/bifpn.py:9-203:
- 1x1 lateral convs (bias, no norm/act) project the 5 backbone levels to
  W_bifpn channels (bifpn.py:52-61)
- D_bifpn chained BiFPNModules (bifpn.py:63-68)
- per module: learnable fusion weights w1 (2, L) and w2 (3, L-2), ReLU'd and
  sum-normalized (+eps), then each fusion node re-divides by the sum of its
  (already normalized) weights + eps — the reference's double normalization
  (bifpn.py:177-201) is replicated exactly for weight-import parity
- top-down path: nearest x2 upsample; bottom-up path: 2x2/2 max pool, with a
  skip from the module's (post-lateral) inputs; one 3x3 conv (bias, no
  norm/act) per fusion node, 2*(L-1) per module
- conv order matches the reference's single `bifpn_convs` list: top-down
  nodes first (levels L-2..0), then bottom-up (levels 1..L-2), then the top
  node (level L-1).

TPU notes: all fused adds are elementwise VPU work that XLA fuses with the
following conv; the nearest upsample is a reshape-broadcast (no gather). A
fused Pallas kernel for (upsample + weighted-add) is available in
kernels/fusion.py and enabled via `use_pallas_fusion`.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvSame, max_pool_2x2_to, upsample_nearest_to,
                     xavier_uniform)

Dtype = Any


class BiFPNModule(nn.Module):
    """One bidirectional fusion pass over L levels (reference bifpn.py:132-203).

    With ``use_pallas=True`` the resize + weighted-add + normalize of each
    fusion node runs as a single Pallas VMEM pass (kernels/fusion.py) instead
    of relying on XLA fusion. Numerics are identical (tested); the flag
    exists so the two lowerings can be A/B benchmarked per hardware
    generation.
    """

    channels: int
    levels: int = 5
    eps: float = 1e-4
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        L = self.levels
        assert len(inputs) == L
        w1 = self.param("w1", nn.initializers.constant(0.5), (2, L), jnp.float32)
        w2 = self.param("w2", nn.initializers.constant(0.5), (3, L - 2),
                        jnp.float32)
        # fast-normalize (reference bifpn.py:177-180)
        w1 = nn.relu(w1)
        w1 = w1 / (jnp.sum(w1, axis=0) + self.eps)
        w2 = nn.relu(w2)
        w2 = w2 / (jnp.sum(w2, axis=0) + self.eps)
        w1 = w1.astype(self.dtype)
        w2 = w2.astype(self.dtype)

        # shape-driven resizes: exact x2 / VALID-pool for the even
        # production geometries (parity path), ceil semantics for the
        # odd feature sizes D7@1636 produces (layers.py docstrings)
        topdown = lambda big, small, a, b: \
            (a * big + b * upsample_nearest_to(
                small, big.shape[1], big.shape[2])) / (a + b + self.eps)
        bottomup = lambda cur, lower, skip, a, b, c: \
            (a * cur + b * max_pool_2x2_to(
                lower, cur.shape[1], cur.shape[2]) + c * skip) \
            / (a + b + c + self.eps)

        if self.use_pallas:
            from ..kernels import fusion as pk
            xla_topdown, xla_bottomup = topdown, bottomup

            # The Pallas fusion kernels assume exact-2x level geometry
            # (kernels/fusion.py reshapes h2//2). Odd pyramids (e.g.
            # D7@1636: 205 -> 103 -> 52 ...) fall back per-node to the XLA
            # path, whose resize helpers handle ceil semantics; shapes are
            # static at trace time so this costs nothing at runtime.
            def topdown(big, small, a, b, _xla=xla_topdown):
                if (big.shape[1], big.shape[2]) == (2 * small.shape[1],
                                                    2 * small.shape[2]):
                    return pk.fuse_topdown_pallas(big, small, a, b,
                                                  eps=self.eps)
                return _xla(big, small, a, b)

            def bottomup(cur, lower, skip, a, b, c, _xla=xla_bottomup):
                if (lower.shape[1], lower.shape[2]) == (2 * cur.shape[1],
                                                        2 * cur.shape[2]):
                    return pk.fuse_bottomup_pallas(cur, lower, skip, a, b, c,
                                                   eps=self.eps)
                return _xla(cur, lower, skip, a, b, c)

        convs = [ConvSame(self.channels, 3, torch_padding=1, dtype=self.dtype,
                          kernel_init=xavier_uniform, name=f"fuse_conv_{i}")
                 for i in range(2 * (L - 1))]

        path = list(inputs)
        skips = list(inputs)
        idx = 0
        # top-down (reference bifpn.py:188-192)
        for i in range(L - 1, 0, -1):
            path[i - 1] = convs[idx](
                topdown(path[i - 1], path[i], w1[0, i - 1], w1[1, i - 1]))
            idx += 1
        # bottom-up with input skip (reference bifpn.py:194-198)
        for i in range(0, L - 2):
            path[i + 1] = convs[idx](
                bottomup(path[i + 1], path[i], skips[i + 1],
                         w2[0, i], w2[1, i], w2[2, i]))
            idx += 1
        # top node: current + maxpool of the level below (bifpn.py:200-202)
        fused = (w1[0, L - 1] * path[L - 1]
                 + w1[1, L - 1] * max_pool_2x2_to(
                     path[L - 2], path[L - 1].shape[1],
                     path[L - 1].shape[2]))
        fused = fused / (w1[0, L - 1] + w1[1, L - 1] + self.eps)
        path[L - 1] = convs[idx](fused)
        return path


class BiFPN(nn.Module):
    """Lateral projections + D_bifpn stacked fusion modules (reference BIFPN).

    Extra-level construction (reference bifpn.py:110-128): when ``num_outs``
    exceeds the number of fused backbone levels, the pyramid is extended on
    top either by stride-2 subsampling (``add_extra_convs=False``; the
    reference's ``F.max_pool2d(x, 1, stride=2)`` — kernel 1, i.e. pure
    subsampling) or by stride-2 3x3 convs (RetinaNet style), the first of
    which reads the last backbone input (``extra_convs_on_inputs=True``,
    reference bifpn.py:119-121) or the last fused output, with an optional
    ReLU before each subsequent extra conv (reference bifpn.py:123-127).
    ``start_level``/``end_level`` slice the backbone levels fed to the
    fusion stack exactly as the reference's constructor does
    (bifpn.py:34-43).
    """

    in_channels: Sequence[int]
    out_channels: int
    stack: int = 2
    num_outs: int = -1          # -1: same as the number of fused levels
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(inputs) == len(self.in_channels)
        end = (len(self.in_channels) if self.end_level == -1
               else self.end_level)
        fused_levels = end - self.start_level
        num_outs = self.num_outs if self.num_outs > 0 else fused_levels
        assert num_outs >= fused_levels, (
            f"num_outs={num_outs} < {fused_levels} fused levels")
        laterals = [
            ConvSame(self.out_channels, 1, dtype=self.dtype,
                     kernel_init=xavier_uniform, name=f"lateral_conv_{i}")(x)
            for i, x in enumerate(inputs[self.start_level:end])
        ]
        for s in range(self.stack):
            laterals = BiFPNModule(channels=self.out_channels,
                                   levels=len(laterals), dtype=self.dtype,
                                   use_pallas=self.use_pallas,
                                   name=f"bifpn_{s}")(laterals)
        outs = list(laterals)
        # part 2: extra levels (reference bifpn.py:110-128)
        if num_outs > len(outs):
            if not self.add_extra_convs:
                for _ in range(num_outs - len(outs)):
                    outs.append(outs[-1][:, ::2, ::2, :])
            else:
                for i in range(num_outs - len(outs)):
                    if i == 0 and self.extra_convs_on_inputs:
                        src = inputs[end - 1].astype(self.dtype)
                    elif i == 0:
                        src = outs[-1]
                    else:
                        src = (nn.relu(outs[-1])
                               if self.relu_before_extra_convs else outs[-1])
                    outs.append(
                        ConvSame(self.out_channels, 3, stride=2,
                                 torch_padding=1, dtype=self.dtype,
                                 kernel_init=xavier_uniform,
                                 name=f"extra_conv_{i}")(src))
        return outs
