"""Serving-path backbone with fused MBConv Pallas kernels.

An inference-engine formulation of `EfficientNetFeatures`: reads the SAME
variables tree the flax model trains/checkpoints (params + batch_stats, the
layout `utils/torch_import.py` documents), folds every frozen BatchNorm into
an affine at trace time, and runs each MBConv expand->BN->swish->depthwise->
BN->swish segment as one Pallas kernel (`kernels/mbconv_kernel.py::
fused_expand_dw_flat`) with the expanded tensor VMEM-resident. Everything
else (stem, SE, project, non-expand blocks) stays on XLA, which already
fuses those optimally.

Checkpoint-compatible by construction: no new parameters, no renames — this
is a different *reader* of the standard tree, equivalence-tested against
`model.backbone` in tests/test_kernels.py.

Only valid for frozen-BN inference (the reference's eval semantics,
efficientdet.py:88-92) and even input sizes (where the reference's
nominal-size SAME padding equals actual-size SAME padding; all D0-D7 input
sizes qualify).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp

from ..config import get_model_params
from ..kernels.mbconv_kernel import fold_bn_affine, fused_expand_dw_flat
from ..ops.padding import same_padding

Dtype = Any

# Largest batch the fused Pallas path has a GREEN on-chip run at on real
# v5e hardware: b8 (BENCH_MODES.json `fusedmb_d0_b8`, 434.8 img/s). Every
# larger batch probed — b16, b128, b256 — trips an uninspectable
# `UNAVAILABLE: TPU device error` Mosaic kernel fault at warmup
# (BENCH_MODES.json `fusedmb_d0_b16` 2026-08-20, `fusedmb_d0_b{128,256}`
# 2026-08-19), which would take down the caller's device — so the fence
# below fails FAST on the host instead. Raise this only with a fresh
# on-chip validation run at the new batch.
FUSED_MAX_BATCH = 8


def _conv(x, kernel, stride, nominal, groups=1, bias=None):
    """ConvSame equivalent (models/layers.py:37-77) on raw kernels."""
    k = kernel.shape[0]
    pad = same_padding(nominal, k, stride)
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def _bn_affine(p, bs, eps):
    return fold_bn_affine(p["scale"], p["bias"], bs["mean"], bs["var"], eps)


def _block_list(model_name: str):
    """Per-block args with repeats expanded — mirrors
    EfficientNetFeatures.setup (models/efficientnet.py:118-142)."""
    blocks_args, gp = get_model_params(model_name)
    out = []
    for stage, stage_args in enumerate(blocks_args):
        for i in range(stage_args.num_repeat):
            ba = stage_args
            if i > 0:
                ba = dataclasses.replace(
                    ba, input_filters=ba.output_filters, stride=1,
                    num_repeat=1)
            out.append((stage, ba))
    return out, gp


def fused_backbone_forward(variables, images: jnp.ndarray,
                           model_name: str = "efficientnet-b0",
                           dtype: Dtype = jnp.bfloat16,
                           interpret: bool | None = None) -> List[jnp.ndarray]:
    """7-stage feature pyramid, numerically matching
    ``model.backbone(images, train=False)`` with frozen BN (within bf16
    rounding when the XLA path also runs bf16)."""
    if interpret is None:
        # compiled Mosaic on TPU; interpret mode elsewhere (CPU tests) —
        # same auto rule as ops/nms.py method='auto'
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret and images.shape[0] > FUSED_MAX_BATCH:
        raise ValueError(
            f"--fused_backbone is validated up to batch {FUSED_MAX_BATCH} "
            f"on TPU (got {images.shape[0]}); larger grids fault the device "
            "(Mosaic kernel fault, BENCH_MODES.json fusedmb rows). Use the "
            "default XLA backbone — it is also faster at every measured "
            "batch (docs/DESIGN.md fused-backbone verdict).")
    assert images.shape[1] % 2 == 0 and images.shape[2] % 2 == 0, \
        "fused serving path requires even input sizes"
    p = variables["params"]["backbone"]
    bs = variables["batch_stats"]["backbone"]
    blocks, gp = _block_list(model_name)
    eps = gp.batch_norm_epsilon
    nominal = gp.image_size

    x = images.astype(dtype)
    s0, b0 = _bn_affine(p["bn0"]["bn"], bs["bn0"]["bn"], eps)
    x = _conv(x, p["conv_stem"]["conv"]["kernel"], 2, nominal)
    x = x.astype(jnp.float32) * s0 + b0
    x = (x * jax.nn.sigmoid(x)).astype(dtype)

    features = []
    prev_stage = 0
    for idx, (stage, ba) in enumerate(blocks):
        if stage != prev_stage:
            features.append(x)
            prev_stage = stage
        bp = p[f"block_{idx}"]
        bb = bs[f"block_{idx}"]
        inputs = x
        expanded = ba.input_filters * ba.expand_ratio

        if ba.expand_ratio != 1:
            sc0, bi0 = _bn_affine(bp["bn0"]["bn"], bb["bn0"]["bn"], eps)
            sc1, bi1 = _bn_affine(bp["bn1"]["bn"], bb["bn1"]["bn"], eps)
            we = bp["expand_conv"]["conv"]["kernel"].reshape(
                ba.input_filters, expanded)
            wd = bp["depthwise_conv"]["conv"]["kernel"].reshape(
                ba.kernel_size, ba.kernel_size, expanded)
            x, se_mean = fused_expand_dw_flat(
                x, we, sc0, bi0, wd, sc1, bi1, stride=ba.stride,
                interpret=interpret)
            s = se_mean[:, None, None, :].astype(dtype)   # (B,1,1,Ce)
        else:
            sc1, bi1 = _bn_affine(bp["bn1"]["bn"], bb["bn1"]["bn"], eps)
            x = _conv(x, bp["depthwise_conv"]["conv"]["kernel"], ba.stride,
                      nominal, groups=expanded)
            x = x.astype(jnp.float32) * sc1 + bi1
            x = (x * jax.nn.sigmoid(x)).astype(dtype)
            s = jnp.mean(x, axis=(1, 2), keepdims=True)

        if ba.se_ratio is not None and 0 < ba.se_ratio <= 1:
            s = _conv(s, bp["se_reduce"]["conv"]["kernel"], 1, nominal,
                      bias=bp["se_reduce"]["conv"]["bias"])
            s = s * jax.nn.sigmoid(s)
            s = _conv(s, bp["se_expand"]["conv"]["kernel"], 1, nominal,
                      bias=bp["se_expand"]["conv"]["bias"])
            x = jax.nn.sigmoid(s).astype(x.dtype) * x

        sc2, bi2 = _bn_affine(bp["bn2"]["bn"], bb["bn2"]["bn"], eps)
        x = _conv(x, bp["project_conv"]["conv"]["kernel"], 1, nominal)
        x = (x.astype(jnp.float32) * sc2 + bi2).astype(dtype)

        if (ba.id_skip and ba.stride == 1
                and ba.input_filters == ba.output_filters):
            x = x + inputs
    features.append(x)
    return features
