"""Tests: YAML configs, checkpoint roundtrip, metric logger, new layers."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientdet_tpu import DetectorConfig
from efficientdet_tpu.models import (ClassificationSubnet,
                                     EfficientNetClassifier, EfficientDet,
                                     RegressionSubnet)
from efficientdet_tpu.models.layers import ConvWS, build_norm
from efficientdet_tpu.train import OptimizerConfig, create_train_state
from efficientdet_tpu.utils import checkpoint as ckpt
from efficientdet_tpu.utils.visualization import MetricLogger
from efficientdet_tpu.utils.yaml_config import experiment_from_yaml


def test_yaml_config_roundtrip(tmp_path):
    path = tmp_path / "exp.yaml"
    path.write_text("""
model:
  num_classes: 7
  network: efficientdet-d1
  bn_mode: train
train:
  learning_rate: 3.0e-4
  batch_size: 16
  bf16: true
data:
  dataset: COCO
  dataset_root: /data/coco
""")
    exp = experiment_from_yaml(str(path))
    assert exp.detector.num_classes == 7
    assert exp.detector.network == "efficientdet-d1"
    assert exp.detector.bn_mode == "train"
    assert exp.learning_rate == 3e-4
    assert exp.batch_size == 16
    assert exp.bf16 is True
    assert exp.dataset == "COCO"
    resolved = exp.detector.resolve()
    assert resolved.input_size == 640 and resolved.W_bifpn == 88


def test_yaml_config_rejects_unknown_keys(tmp_path):
    path = tmp_path / "bad.yaml"
    path.write_text("model:\n  num_classes: 2\n  bogus_key: 1\n")
    with pytest.raises(ValueError, match="bogus_key"):
        experiment_from_yaml(str(path))


def test_repo_config_file_loads():
    exp = experiment_from_yaml(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs", "efficientdet-d0.yaml"))
    assert exp.detector.network == "efficientdet-d0"
    assert exp.bf16 is True


def test_checkpoint_save_restore_roundtrip(tmp_path):
    size = 128
    cfg = DetectorConfig(num_classes=2, network="efficientdet-d0",
                         input_size=size).resolve()
    model = EfficientDet(config=cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), size,
                               OptimizerConfig(learning_rate=2e-4))
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, jax.device_get(state), cfg, epoch=3)
    assert ckpt.latest_epoch(d) == 3
    loaded_cfg = ckpt.load_config(d)
    assert loaded_cfg == cfg

    state2 = create_train_state(model, jax.random.PRNGKey(1), size,
                                OptimizerConfig(learning_rate=2e-4))
    restored, next_epoch = ckpt.restore_checkpoint(d, state2)
    assert next_epoch == 4
    orig = jax.tree.leaves(state.params)[0]
    got = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(orig), np.asarray(got))
    # weights-only load API
    variables = ckpt.load_weights(
        d, {"params": state2.params, "batch_stats": state2.batch_stats})
    got2 = jax.tree.leaves(variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(orig), np.asarray(got2))


def test_checkpoint_step_dir_paths(tmp_path):
    """The per-epoch subdir train.py prints (<root>/<epoch>) must be loadable
    everywhere the manager root is (eval.py --weight, --resume, config)."""
    size = 128
    cfg = DetectorConfig(num_classes=2, network="efficientdet-d0",
                         input_size=size).resolve()
    model = EfficientDet(config=cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), size,
                               OptimizerConfig())
    root = str(tmp_path / "ck")
    step_dir = ckpt.save_checkpoint(root, jax.device_get(state), cfg, epoch=2)
    assert step_dir == os.path.join(os.path.abspath(root), "2")
    assert ckpt.latest_epoch(step_dir) == 2
    assert ckpt.load_config(step_dir) == cfg
    variables = ckpt.load_weights(
        step_dir, {"params": state.params, "batch_stats": state.batch_stats})
    orig = jax.tree.leaves(state.params)[0]
    got = jax.tree.leaves(variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(orig), np.asarray(got))
    state2 = create_train_state(model, jax.random.PRNGKey(1), size,
                                OptimizerConfig())
    restored, next_epoch = ckpt.restore_checkpoint(step_dir, state2)
    assert next_epoch == 3


def test_checkpoint_digit_named_root_not_a_step_dir(tmp_path):
    """A nonexistent root whose NAME is digits (runs/20260817) must be
    treated as an empty root, not as (runs, step=20260817)."""
    root = str(tmp_path / "20260817")
    assert ckpt.latest_epoch(root) is None
    size = 128
    cfg = DetectorConfig(num_classes=2, network="efficientdet-d0",
                         input_size=size).resolve()
    model = EfficientDet(config=cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), size,
                               OptimizerConfig())
    with pytest.raises(FileNotFoundError):
        ckpt.restore_checkpoint(root, state)
    # and it works as a real manager root
    ckpt.save_checkpoint(root, jax.device_get(state), cfg, epoch=0)
    assert ckpt.latest_epoch(root) == 0


def test_pth_blob_is_self_describing(tmp_path):
    """Reference .pth training blobs carry {'epoch','parser','state_dict'}
    (reference train.py:279-283); eval/demo/train must recover
    num_class/network/epoch from the pickled parser with NO flags, exactly
    like reference eval.py:365-374 / demo.py:48-54 / train.py:213-227."""
    torch = pytest.importorskip("torch")
    import argparse
    parser = argparse.Namespace(num_class=80, network="efficientdet-d4",
                                dataset="COCO", lr=1e-4)
    blob = {"epoch": 17, "parser": parser,
            "state_dict": {"backbone._conv_stem.weight": torch.zeros(1)}}
    path = str(tmp_path / "checkpoint_17.pth")
    torch.save(blob, path)

    meta = ckpt.load_pth_meta(path)
    assert meta == {"num_class": 80, "network": "efficientdet-d4",
                    "epoch": 17}
    cfg = ckpt.load_config(path)
    assert cfg.num_classes == 80
    assert cfg.network == "efficientdet-d4"
    assert cfg.input_size == 1024            # resolved via EFFICIENTDET[d4]
    assert cfg.W_bifpn == 224 and cfg.D_bifpn == 6

    # a bare state_dict (pretrained backbone blob) is NOT self-describing
    bare = str(tmp_path / "bare.pth")
    torch.save({"stem.weight": torch.zeros(1)}, bare)
    assert ckpt.load_pth_meta(bare) is None
    assert ckpt.load_config(bare) is None

    # dict-form parser (robustness: some forks save vars(args))
    blob2 = {"epoch": 3, "parser": {"num_class": 20,
                                    "network": "efficientdet-d1"},
             "state_dict": {}}
    p2 = str(tmp_path / "dictparser.pth")
    torch.save(blob2, p2)
    cfg2 = ckpt.load_config(p2)
    assert (cfg2.num_classes, cfg2.network) == (20, "efficientdet-d1")


def test_metric_logger(tmp_path):
    log = MetricLogger(str(tmp_path))
    log.update(0, loss=2.0)
    log.update(1, loss=1.0)
    assert log.mean("loss") == 1.5
    log.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    import json
    rec = json.loads(lines[1])
    assert rec["step"] == 1 and rec["loss"] == 1.0
    assert "steps_per_sec" in rec


def test_conv_ws_standardizes():
    m = ConvWS(features=8, kernel_size=3, torch_padding=1)
    x = jnp.ones((1, 8, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 8, 8, 8)
    # standardized kernel has ~zero mean / unit std per out channel
    k = params["params"]["kernel"]
    kstd = (k - k.mean(axis=(0, 1, 2))) / (k.std(axis=(0, 1, 2)) + 1e-5)
    assert abs(float(kstd.mean())) < 1e-6


def test_build_norm_registry():
    bn = build_norm("BN")
    gn = build_norm("GN", num_groups=4)
    ident = build_norm(None)
    x = jnp.ones((2, 4, 4, 8))
    assert ident(x, True) is x
    import flax.linen as nn

    class Wrap(nn.Module):
        kind: str

        @nn.compact
        def __call__(self, x):
            return build_norm(self.kind, num_groups=4)(x, False)

    for kind in ("BN", "GN"):
        m = Wrap(kind=kind)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == x.shape
    with pytest.raises(KeyError):
        build_norm("SN")


@pytest.mark.slow  # heavy XLA compile
def test_classifier_logits_shape():
    m = EfficientNetClassifier(model_name="efficientnet-b0", num_classes=10)
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(v, x)
    assert logits.shape == (1, 10)


def test_simple_subnets():
    reg = RegressionSubnet(in_channels=32)
    cls = ClassificationSubnet(in_channels=32, num_classes=5)
    x = jnp.zeros((2, 8, 8, 32))
    vr = reg.init(jax.random.PRNGKey(0), x)
    vc = cls.init(jax.random.PRNGKey(0), x)
    r = reg.apply(vr, x)
    c = cls.apply(vc, x)
    assert r.shape == (2, 8 * 8 * 9, 4)
    assert c.shape == (2, 8 * 8 * 9, 5)
    assert 0 <= float(jnp.min(c)) and float(jnp.max(c)) <= 1


def test_pretrained_offline_raises():
    from efficientdet_tpu.utils.pretrained import URL_MAP
    assert set(URL_MAP) == {f"efficientnet-b{i}" for i in range(8)}
