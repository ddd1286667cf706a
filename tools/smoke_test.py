#!/usr/bin/env python
"""CI smoke test: build the backbone and detector, run one forward pass.

Equivalent of reference test.py:1-22 (shape-print smoke), but with assertions
and no network downloads. Uses 128px input so it runs in seconds on CPU.

    JAX_PLATFORMS=cpu python tools/smoke_test.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main():
    import jax
    import jax.numpy as jnp
    from efficientdet_tpu import DetectorConfig
    from efficientdet_tpu.models import (EfficientDet, EfficientNetFeatures,
                                         anchors_for_config)
    from efficientdet_tpu.ops import num_anchors_for_image_size

    size = 128
    x = jnp.zeros((1, size, size, 3))

    backbone = EfficientNetFeatures(model_name="efficientnet-b0")
    feats = backbone.apply(backbone.init(jax.random.PRNGKey(0), x), x)
    assert len(feats) == 7
    print("backbone:", [tuple(f.shape) for f in feats])

    cfg = DetectorConfig(num_classes=20, network="efficientdet-d0",
                         input_size=size).resolve()
    model = EfficientDet(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), x)
    cls, reg = model.apply(variables, x)
    a = num_anchors_for_image_size(size)
    assert cls.shape == (1, a, 20) and reg.shape == (1, a, 4)
    assert anchors_for_config(cfg).shape == (a, 4)
    print("detector:", cls.shape, reg.shape)
    print("smoke test OK")


if __name__ == "__main__":
    main()
