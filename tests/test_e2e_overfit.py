"""End-to-end overfit -> eval: training must produce real detections.

Opt-in (RUN_SLOW=1): a few hundred optimizer steps on CPU. The same flow at
800 epochs on TPU reaches mAP@0.5 = 0.90 (docs/DESIGN.md).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                                reason="set RUN_SLOW=1 to run")


def test_overfit_then_detect():
    import jax
    from efficientdet_tpu import DetectorConfig
    from efficientdet_tpu.data import (SyntheticDetection, collate,
                                       eval_transforms)
    from efficientdet_tpu.eval import evaluate_model
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.train import (OptimizerConfig, create_train_state,
                                        make_eval_step, make_train_step)

    size, n_cls = 128, 3
    cfg = DetectorConfig(num_classes=n_cls, network="efficientdet-d0",
                         input_size=size, threshold=0.3).resolve()
    model = EfficientDet(config=cfg)
    ds = SyntheticDetection(length=2, image_size=size, num_classes=n_cls,
                            max_objects=2, transform=eval_transforms(size),
                            seed=0)
    batch = jax.device_put(collate([ds[0], ds[1]], max_boxes=8))

    state = create_train_state(model, jax.random.PRNGKey(0), size,
                               OptimizerConfig(learning_rate=1e-3))
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    for _ in range(300):
        state, metrics = step(state, batch, rng)
    final_loss = float(metrics["loss"])
    assert final_loss < 0.4, final_loss

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = jax.jit(make_eval_step(model, cfg))
    mean_ap, _ = evaluate_model(
        ds, lambda im: eval_step(variables, im), n_cls, batch_size=2,
        score_threshold=0.3, verbose=False)
    assert mean_ap > 0.3, mean_ap
