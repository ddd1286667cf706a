"""Numerical parity vs the PyTorch reference.

Builds the reference modules (random init, CPU, no downloads) via importlib,
exports their state_dict, imports it into the flax model with
utils/torch_import.py, and compares forward outputs on random input.

This pins down: SAME-padding semantics, BN math, swish, SE, BiFPN fusion
(incl. the double-normalization quirk), head reshape/anchor ordering, and the
OIHW->HWIO weight conversion — i.e. everything needed for reference
checkpoints to predict identically on TPU.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # full-model compiles + torch forwards

import jax
import jax.numpy as jnp

from efficientdet_tpu import DetectorConfig
from efficientdet_tpu.models import EfficientDet
from efficientdet_tpu.utils import torch_import

REF = "/root/reference"
SIZE = 128


@pytest.fixture(scope="module", autouse=True)
def _highest_precision():
    """XLA:CPU's default conv precision differs from torch by ~1e-3; force
    full f32 so parity is checked at ~1e-6."""
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


@pytest.fixture(scope="module")
def ref_modules():
    """Load reference model modules without the package __init__ (which pulls
    in torchvision, absent here)."""
    if "models" not in sys.modules or not hasattr(sys.modules.get("models"), "__path__"):
        pkg = types.ModuleType("models")
        pkg.__path__ = [f"{REF}/models"]
        sys.modules["models"] = pkg

    def load(name, path):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("models.utils", f"{REF}/models/utils.py")
    load("models.module", f"{REF}/models/module.py")
    effnet = load("models.efficientnet", f"{REF}/models/efficientnet.py")
    bifpn = load("models.bifpn", f"{REF}/models/bifpn.py")
    retina = load("models.retinahead", f"{REF}/models/retinahead.py")
    return effnet, bifpn, retina


def _randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.5, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.fixture(scope="module")
def torch_d0(ref_modules):
    effnet, bifpn, retina = ref_modules
    torch.manual_seed(0)
    backbone = effnet.EfficientNet.from_name("efficientnet-b0")
    neck = bifpn.BIFPN(in_channels=backbone.get_list_features()[-5:],
                       out_channels=64, stack=2, num_outs=5)
    head = retina.RetinaHead(num_classes=20, in_channels=64)
    for m in (backbone, neck, head):
        m.eval()
    _randomize_bn_stats(backbone)
    return backbone, neck, head


@pytest.fixture(scope="module")
def jax_d0(torch_d0):
    backbone, neck, head = torch_d0
    cfg = DetectorConfig(num_classes=20, network="efficientdet-d0",
                         input_size=SIZE).resolve()
    model = EfficientDet(config=cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3)))
    variables = jax.tree.map(np.asarray, variables)  # mutable numpy tree

    state = {}
    for prefix, mod in (("backbone", backbone), ("neck", neck),
                        ("bbox_head", head)):
        for k, v in mod.state_dict().items():
            state[f"{prefix}.{k}"] = v
    # num_batches_tracked has no flax counterpart
    state = {k: v for k, v in state.items() if "num_batches_tracked" not in k}
    variables = torch_import.import_efficientdet(state, variables)
    return cfg, model, variables


def test_backbone_parity(torch_d0, jax_d0):
    backbone, _, _ = torch_d0
    _, model, variables = jax_d0
    rng = np.random.RandomState(0)
    x = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    with torch.no_grad():
        ref_feats = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_feats = model.apply(variables, jnp.asarray(x),
                            method=lambda m, im: m.backbone(im, False))
    assert len(got_feats) == len(ref_feats) == 7
    for i, (g, r) in enumerate(zip(got_feats, ref_feats)):
        r = r.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5,
                                   err_msg=f"stage {i}")


def test_full_model_parity(torch_d0, jax_d0):
    backbone, neck, head = torch_d0
    _, model, variables = jax_d0
    rng = np.random.RandomState(1)
    x = rng.randn(2, SIZE, SIZE, 3).astype(np.float32)
    with torch.no_grad():
        feats = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        pyramid = neck([f for f in feats[-5:]])
        cls_list, reg_list = head(pyramid)
        ref_cls = torch.cat(list(cls_list), dim=1).numpy()
        ref_reg = torch.cat(list(reg_list), dim=1).numpy()
    got_cls, got_reg = model.apply(variables, jnp.asarray(x))
    assert got_cls.shape == ref_cls.shape
    assert got_reg.shape == ref_reg.shape
    np.testing.assert_allclose(np.asarray(got_cls), ref_cls, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_reg), ref_reg, rtol=1e-3,
                               atol=1e-4)


def test_pretrained_pth_blob_import_end_to_end(ref_modules, tmp_path):
    """Exercise the real published-blob import path with a byte-format-
    identical local fixture (no egress in this environment).

    The reference loads the lukemelas URL_MAP blobs with a STRICT
    ``model.load_state_dict(state_dict)`` (reference models/utils.py:317-321),
    so the reference model's own ``state_dict()`` keys ARE the published
    schema — including the ``_conv_head``/``_bn1``/``_fc`` classifier keys a
    detector backbone must skip. torch.save that state_dict as a ``.pth``,
    push it through ``load_pretrained_backbone(path=...)`` (the same code
    path a downloaded blob takes), and assert the flax backbone reproduces
    the torch pyramid. Fails if the import mapping drifts from the published
    key schema."""
    effnet, _, _ = ref_modules
    from efficientdet_tpu.utils.pretrained import load_pretrained_backbone

    torch.manual_seed(7)
    ref = effnet.EfficientNet.from_name("efficientnet-b0")
    ref.eval()
    _randomize_bn_stats(ref, seed=7)
    blob = tmp_path / "efficientnet-b0-fixture.pth"
    torch.save(ref.state_dict(), str(blob))

    cfg = DetectorConfig(num_classes=20, network="efficientdet-d0",
                         input_size=SIZE).resolve()
    model = EfficientDet(config=cfg)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, SIZE, SIZE, 3)))
    variables = jax.tree.map(np.asarray, variables)
    variables = load_pretrained_backbone("efficientnet-b0", variables,
                                         path=str(blob))

    rng = np.random.RandomState(7)
    x = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    with torch.no_grad():
        # reference EfficientNet.forward returns the 7-level feature pyramid
        ref_feats = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_feats = model.apply(variables, jnp.asarray(x),
                            method=lambda m, im: m.backbone(im, False))
    assert len(got_feats) == len(ref_feats) == 7
    for i, (g, r) in enumerate(zip(got_feats, ref_feats)):
        r = r.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5,
                                   err_msg=f"stage {i}")


def test_pretrained_blob_key_schema_frozen(ref_modules):
    """The import mapping must consume EXACTLY the published key schema:
    every key of a reference-built state_dict maps (or is an explicit
    classifier-head skip), and no silently-unconsumed key class exists."""
    effnet, _, _ = ref_modules
    ref = effnet.EfficientNet.from_name("efficientnet-b0")
    skipped = []
    for k in ref.state_dict():
        if "num_batches_tracked" in k:
            continue
        mapped = torch_import._map_backbone_key(k)  # raises on unknown keys
        if mapped is None:
            skipped.append(k.split(".")[0])
    # only the classifier-head pieces may be skipped
    assert set(skipped) == {"_conv_head", "_bn1", "_fc"}, sorted(set(skipped))


def test_import_rejects_shape_mismatch(jax_d0):
    _, _, variables = jax_d0
    bad = {"bbox_head.retina_reg.weight": torch.zeros(36, 999, 3, 3)}
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_import.import_efficientdet(bad, variables)


def test_strip_module_prefix():
    sd = {"module.backbone._conv_stem.weight": 1, "plain": 2}
    out = torch_import.strip_module_prefix(sd)
    assert set(out) == {"backbone._conv_stem.weight", "plain"}


def test_export_roundtrip_full_model(torch_d0, jax_d0):
    """flax -> torch export (utils/torch_export.py) is the exact inverse of
    the import: push the jax_d0 variables back into freshly-initialized
    reference modules and demand forward parity. This is the machinery
    tools/parity_eval.py uses to run the reference's own evaluate() loop
    (reference eval.py:165-257) on a checkpoint trained in this framework."""
    from efficientdet_tpu.utils.torch_export import export_efficientdet

    backbone, neck, head = torch_d0
    _, model, variables = jax_d0

    # a DIFFERENTLY-initialized template (so parity can't come from the
    # template's own values)
    torch.manual_seed(99)
    effnet = sys.modules["models.efficientnet"]
    bifpn = sys.modules["models.bifpn"]
    retina = sys.modules["models.retinahead"]
    b2 = effnet.EfficientNet.from_name("efficientnet-b0")
    n2 = bifpn.BIFPN(in_channels=b2.get_list_features()[-5:],
                     out_channels=64, stack=2, num_outs=5)
    h2 = retina.RetinaHead(num_classes=20, in_channels=64)

    template = {}
    for prefix, mod in (("backbone", b2), ("neck", n2), ("bbox_head", h2)):
        for k, v in mod.state_dict().items():
            template[f"{prefix}.{k}"] = v
    state = export_efficientdet(variables, template)
    for prefix, mod in (("backbone", b2), ("neck", n2), ("bbox_head", h2)):
        mod.load_state_dict(
            {k[len(prefix) + 1:]: v for k, v in state.items()
             if k.startswith(prefix + ".")}, strict=True)
        mod.eval()

    rng = np.random.RandomState(3)
    x = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    with torch.no_grad():
        feats = b2(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        pyramid = n2([f for f in feats[-5:]])
        cls_list, reg_list = h2(pyramid)
        ref_cls = torch.cat(list(cls_list), dim=1).numpy()
        ref_reg = torch.cat(list(reg_list), dim=1).numpy()
    got_cls, got_reg = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_cls), ref_cls, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_reg), ref_reg, rtol=1e-3,
                               atol=1e-4)


def test_train_cli_pretrained_backbone_flag(ref_modules, tmp_path):
    """`train.py --pretrained_backbone blob.pth` must route the blob through
    ``load_pretrained_backbone`` before training starts — the reference's
    from_pretrained -> train flow (models/utils.py:317-328, train.py:62-66).
    Uses a schema-identical local fixture blob (no egress) and --num_epoch 0
    so only the init + import path runs."""
    import os
    import subprocess
    import sys
    effnet, _, _ = ref_modules
    torch.manual_seed(11)
    ref = effnet.EfficientNet.from_name("efficientnet-b0")
    ref.eval()
    blob = tmp_path / "efficientnet-b0-fixture.pth"
    torch.save(ref.state_dict(), str(blob))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "train.py"),
         "--dataset", "synthetic", "--synthetic_length", "4",
         "--batch_size", "2", "--input_size", str(SIZE),
         "--num_epoch", "0", "--platform", "cpu", "--num_devices", "1",
         "--pretrained_backbone", str(blob),
         "--save_folder", str(tmp_path / "w")],
        capture_output=True, text=True, timeout=900, cwd=root, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "initialized efficientnet-b0 backbone from" in proc.stdout, \
        proc.stdout[-2000:]
