"""Pretrained ImageNet EfficientNet weights: download + import.

Capability parity with reference models/utils.py:305-328 (`url_map` +
`load_pretrained_weights` via torch model_zoo). The checkpoint URLs are the
public lukemelas/EfficientNet-PyTorch release blobs the reference uses.

This environment has no egress; download failures raise a clear error and
`from_pretrained` accepts a local `.pth` path instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

# Same public GCS blobs the reference downloads (models/utils.py:305-314).
_GCS = "http://storage.googleapis.com/public-models/efficientnet"
URL_MAP = {
    "efficientnet-b0": f"{_GCS}/efficientnet-b0-355c32eb.pth",
    "efficientnet-b1": f"{_GCS}/efficientnet-b1-f1951068.pth",
    "efficientnet-b2": f"{_GCS}/efficientnet-b2-8bb594d6.pth",
    "efficientnet-b3": f"{_GCS}/efficientnet-b3-5fb5a3c3.pth",
    "efficientnet-b4": f"{_GCS}/efficientnet-b4-6ed6700e.pth",
    "efficientnet-b5": f"{_GCS}/efficientnet-b5-b6417697.pth",
    "efficientnet-b6": f"{_GCS}/efficientnet-b6-c76e70fd.pth",
    "efficientnet-b7": f"{_GCS}/efficientnet-b7-dcc49843.pth",
}


def load_pretrained_backbone(model_name: str, variables: Dict[str, Any],
                             path: Optional[str] = None,
                             prefix=("backbone",)) -> Dict[str, Any]:
    """Load ImageNet weights into the backbone subtree of `variables`.

    `path`: local .pth file; if None, downloads URL_MAP[model_name] via
    torch.hub (requires network). Returns the updated variables tree.
    """
    from . import torch_import
    if path is None:
        import torch
        url = URL_MAP[model_name]
        try:
            state_dict = torch.hub.load_state_dict_from_url(
                url, map_location="cpu")
        except Exception as e:  # no egress in this environment
            raise RuntimeError(
                f"cannot download pretrained weights for {model_name} "
                f"({url}): {e}. Pass a local .pth via `path=` instead."
            ) from e
    else:
        state_dict = torch_import.load_torch_checkpoint(path)
        if isinstance(state_dict, dict) and "state_dict" in state_dict:
            state_dict = state_dict["state_dict"]
    state_dict = {k: v for k, v in state_dict.items()
                  if "num_batches_tracked" not in k}
    return torch_import.import_efficientnet(state_dict, variables,
                                            prefix=tuple(prefix))
