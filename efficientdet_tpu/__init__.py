"""EfficientDet-TPU: a TPU-native (JAX/XLA/Pallas) object-detection framework.

Feature-parity rebuild of ``toandaominh1997/EfficientDet.Pytorch`` designed
TPU-first: NHWC layouts, static shapes, vectorized anchor matching, fixed-shape
on-device NMS, mesh-sharded data-parallel training via ``jax.sharding``.
"""

from .config import (EFFICIENTDET, MODEL_MAP, BlockArgs, BlockDecoder,
                     DetectorConfig, GlobalParams, efficientnet_params,
                     get_model_params, round_filters, round_repeats)

__version__ = "0.1.0"
