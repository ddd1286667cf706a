"""PyTorch checkpoint import: reference `.pth` blobs -> flax variable trees.

Capability parity with the reference's weight flows:
- pretrained ImageNet EfficientNet checkpoints (reference
  models/utils.py:305-328, keys like ``_conv_stem.weight``)
- full EfficientDet training checkpoints
  ``{'epoch', 'parser', 'state_dict'}`` (reference train.py:279-283),
  keys like ``backbone._blocks.3._se_reduce.weight``.

Layout conversion: torch conv weights are OIHW; flax NHWC convs use HWIO —
transpose (2, 3, 1, 0). Depthwise convs (torch (C,1,kh,kw)) map to flax
feature_group_count kernels (kh,kw,1,C) with the same transpose. BatchNorm
weight/bias/running_mean/running_var map to scale/bias and batch_stats
mean/var.

Import is strict by default: every torch tensor must land somewhere and every
flax leaf it targets must match shape, so silent drift is impossible.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Tuple

import numpy as np

Tree = Dict[str, Any]


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def _conv_kernel(x) -> np.ndarray:
    return _t(x).transpose(2, 3, 1, 0)


def _set(tree: Tree, path: Tuple[str, ...], value: np.ndarray,
         strict: bool = True) -> None:
    node = tree
    for key in path[:-1]:
        node = node[key]
    leaf = path[-1]
    if strict:
        old = node[leaf]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{tuple(old.shape)} vs torch {tuple(value.shape)}")
        value = value.astype(np.asarray(old).dtype)
    node[leaf] = value


def _map_backbone_key(key: str):
    """Reference EfficientNet state_dict key -> (collection, flax path) or None."""
    parts = key.split(".")
    name = parts[0]
    bn_map = {"weight": ("params", "scale"), "bias": ("params", "bias"),
              "running_mean": ("batch_stats", "mean"),
              "running_var": ("batch_stats", "var")}

    if name in ("_conv_stem",):
        return ("params", ("conv_stem", "conv", "kernel"), _conv_kernel)
    if name in ("_bn0", "_bn1"):
        # _bn1 belongs to the (unused) classification head; skip it.
        if name == "_bn1":
            return None
        coll, leaf = bn_map[parts[1]]
        return (coll, ("bn0", "bn", leaf), _t)
    if name == "_blocks":
        idx = parts[1]
        sub = parts[2]
        block = f"block_{idx}"
        conv_map = {"_expand_conv": "expand_conv",
                    "_depthwise_conv": "depthwise_conv",
                    "_project_conv": "project_conv",
                    "_se_reduce": "se_reduce", "_se_expand": "se_expand"}
        bn_names = {"_bn0": "bn0", "_bn1": "bn1", "_bn2": "bn2"}
        if sub in conv_map:
            leaf = "kernel" if parts[3] == "weight" else "bias"
            fn = _conv_kernel if leaf == "kernel" else _t
            return ("params", (block, conv_map[sub], "conv", leaf), fn)
        if sub in bn_names:
            coll, leaf = bn_map[parts[3]]
            return (coll, (block, bn_names[sub], "bn", leaf), _t)
    # classification head pieces not used for detection
    if name in ("_conv_head", "_fc", "_bn1"):
        return None
    raise KeyError(f"unrecognized backbone key: {key}")


def import_efficientnet(state_dict: Mapping[str, Any], variables: Tree,
                        prefix: Tuple[str, ...] = ("backbone",)) -> Tree:
    """Load a reference EfficientNet state_dict into the backbone subtree.

    `variables` is a mutable dict {'params': ..., 'batch_stats': ...}
    (e.g. flax `FrozenDict.unfreeze()` output or plain dict from model.init).
    Returns the same tree, modified in place.
    """
    for key, value in state_dict.items():
        mapped = _map_backbone_key(key)
        if mapped is None:
            continue
        coll, path, fn = mapped
        _set(variables[coll], prefix + path, fn(value))
    return variables


def _map_detector_key(key: str):
    """Full reference EfficientDet state_dict key -> (collection, path, fn)."""
    parts = key.split(".")
    top = parts[0]
    if top == "backbone":
        sub = _map_backbone_key(".".join(parts[1:]))
        if sub is None:
            return None
        coll, path, fn = sub
        return (coll, ("backbone",) + path, fn)
    if top == "neck":
        if parts[1] == "lateral_convs":
            i = parts[2]
            # ConvModule -> .conv.{weight,bias}
            leaf = "kernel" if parts[4] == "weight" else "bias"
            fn = _conv_kernel if leaf == "kernel" else _t
            return ("params", ("neck", f"lateral_conv_{i}", "conv", leaf), fn)
        if parts[1] == "stack_bifpn_convs":
            s = parts[2]
            if parts[3] in ("w1", "w2"):
                return ("params", ("neck", f"bifpn_{s}", parts[3]), _t)
            if parts[3] == "bifpn_convs":
                j = parts[4]
                # nn.Sequential(ConvModule) -> .{j}.0.conv.{weight,bias}
                leaf = "kernel" if parts[7] == "weight" else "bias"
                fn = _conv_kernel if leaf == "kernel" else _t
                return ("params",
                        ("neck", f"bifpn_{s}", f"fuse_conv_{j}", "conv", leaf),
                        fn)
    if top == "bbox_head":
        group = parts[1]
        if group in ("cls_convs", "reg_convs"):
            i = parts[2]
            stem = "cls_conv" if group == "cls_convs" else "reg_conv"
            leaf = "kernel" if parts[4] == "weight" else "bias"
            fn = _conv_kernel if leaf == "kernel" else _t
            return ("params", ("head", f"{stem}_{i}", "conv", leaf), fn)
        if group in ("retina_cls", "retina_reg"):
            leaf = "kernel" if parts[2] == "weight" else "bias"
            fn = _conv_kernel if leaf == "kernel" else _t
            return ("params", ("head", group, leaf), fn)
    # anchors/criterion/etc. hold no parameters; DataParallel prefix handled
    # by the caller via strip_module_prefix.
    raise KeyError(f"unrecognized detector key: {key}")


def import_efficientdet(state_dict: Mapping[str, Any], variables: Tree) -> Tree:
    """Load a full reference EfficientDet state_dict into a variables tree."""
    for key, value in state_dict.items():
        mapped = _map_detector_key(key)
        if mapped is None:
            continue
        coll, path, fn = mapped
        _set(variables[coll], path, fn(value))
    return variables


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel's 'module.' prefix (reference utils/helper.py:25-30)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


def load_torch_checkpoint(path: str):
    """torch.load a reference checkpoint; returns the raw python object.

    Accepts either a bare state_dict (pretrained backbone) or the training
    blob {'epoch', 'parser', 'state_dict'} (reference train.py:279-283).
    A 1-deep cache avoids re-reading the same blob when a driver recovers
    the config (checkpoint.load_pth_meta) and then loads the weights.
    """
    global _LAST_BLOB
    mtime = os.path.getmtime(path)
    if _LAST_BLOB is not None and _LAST_BLOB[0] == (path, mtime):
        return _LAST_BLOB[1]
    import torch  # local import: torch is only needed for interop
    blob = torch.load(path, map_location="cpu", weights_only=False)
    _LAST_BLOB = ((path, mtime), blob)
    return blob


_LAST_BLOB = None
