"""Flax variables -> PyTorch reference state_dict (inverse of torch_import).

Purpose: metric-level parity experiments. The reference's own evaluator
(reference eval.py:165-257) can only consume a torch ``EfficientDet``;
exporting a checkpoint trained in this framework into that model lets the
two implementations be compared mAP-for-mAP on identical weights and images
— the BASELINE.md "within 0.2 of the reference" criterion made locally
testable without any dataset egress.

Mechanics: torch_import._map_detector_key already defines the bijection
between reference state_dict keys and flax tree paths; this module walks a
*template* state_dict (produced by instantiating the reference model, so the
key set is exactly the published schema) and fills each tensor from the flax
tree, applying the inverse layout transform (HWIO -> OIHW for conv kernels).
Keys the import skips (the unused ImageNet classifier head ``_conv_head`` /
``_bn1`` / ``_fc``, reference models/efficientnet.py:170-177, and BN
``num_batches_tracked`` counters) keep their template values — they are dead
in the detection forward.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from . import torch_import

Tree = Dict[str, Any]


def _get(tree: Tree, path: Tuple[str, ...]) -> np.ndarray:
    node = tree
    for key in path:
        node = node[key]
    return np.asarray(node, dtype=np.float32)


def export_efficientdet(variables: Mapping[str, Any],
                        template: Mapping[str, Any]) -> Dict[str, Any]:
    """Fill a reference EfficientDet state_dict from a flax variables tree.

    ``template``: a state_dict from a freshly built reference model (its keys
    ARE the schema). Returns a new dict of torch tensors, same keys/shapes.
    Raises if any mapped leaf's shape disagrees — silent drift is impossible
    in either direction.
    """
    import torch

    out: Dict[str, Any] = {}
    for key, tensor in template.items():
        if key.endswith("num_batches_tracked"):
            out[key] = tensor.clone()
            continue
        mapped = torch_import._map_detector_key(key)
        if mapped is None:  # dead ImageNet classifier head
            out[key] = tensor.clone()
            continue
        coll, path, fn = mapped
        value = _get(variables[coll], path)
        if fn is torch_import._conv_kernel:  # HWIO -> OIHW
            value = value.transpose(3, 2, 0, 1)
        if tuple(value.shape) != tuple(tensor.shape):
            raise ValueError(
                f"shape mismatch exporting {key}: flax {tuple(value.shape)} "
                f"vs torch {tuple(tensor.shape)}")
        out[key] = torch.from_numpy(np.ascontiguousarray(value))
    return out
