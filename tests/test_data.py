"""Data pipeline tests: transforms, padding, loaders, VOC XML, COCO JSON."""

import json
import os

import numpy as np
import pytest

from efficientdet_tpu.data import (Augmenter, CocoDataset, DataLoader,
                                   Normalizer, Resizer, SyntheticDetection,
                                   VOCDetection, collate, eval_transforms,
                                   pad_annotations, parse_voc_xml,
                                   train_transforms)

cv2 = pytest.importorskip("cv2")


def test_normalizer():
    img = np.full((4, 4, 3), 0.5, dtype=np.float32)
    out = Normalizer()({"img": img, "annot": np.zeros((0, 5))})
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out["img"][0, 0], expected, rtol=1e-5)


def test_augmenter_flip_mirrors_boxes():
    rng = np.random.RandomState(0)
    img = np.zeros((10, 20, 3), dtype=np.float32)
    img[:, :5] = 1.0
    annot = np.array([[2.0, 1.0, 6.0, 5.0, 3.0]], dtype=np.float32)
    aug = Augmenter(flip_prob=1.1, rng=rng)  # always flip
    out = aug({"img": img, "annot": annot})
    np.testing.assert_allclose(out["annot"][0, :4], [20 - 6, 1, 20 - 2, 5])
    assert out["img"][0, -1, 0] == 1.0  # left stripe moved right


def test_resizer_scale_and_padding():
    img = np.ones((100, 200, 3), dtype=np.float32)
    annot = np.array([[10.0, 10.0, 50.0, 50.0, 0.0]], dtype=np.float32)
    out = Resizer(64)({"img": img, "annot": annot})
    assert out["img"].shape == (64, 64, 3)
    assert out["scale"] == 64 / 200
    np.testing.assert_allclose(out["annot"][0, :4],
                               np.array([10, 10, 50, 50]) * 64 / 200)
    # bottom is zero padding (100*0.32 = 32 rows of content)
    assert out["img"][40:, :, :].sum() == 0


def test_pad_annotations_fixed_shape_and_overflow():
    a1 = np.array([[0, 0, 10, 10, 1]], dtype=np.float32)
    a2 = np.zeros((0, 5), dtype=np.float32)
    big = np.stack([[0, 0, w, w, 0] for w in range(1, 8)]).astype(np.float32)
    out = pad_annotations([a1, a2, big], max_boxes=4)
    assert out.shape == (3, 4, 5)
    assert (out[0, 1:] == -1).all()
    assert (out[1] == -1).all()
    # overflow keeps largest areas
    assert set(out[2, :, 2].tolist()) == {7, 6, 5, 4}


def test_collate_shapes():
    ds = SyntheticDetection(length=4, image_size=64, num_classes=3)
    batch = collate([ds[i] for i in range(4)], max_boxes=8)
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["annotations"].shape == (4, 8, 5)
    assert batch["scales"].shape == (4,)


def test_dataloader_epochs_and_determinism():
    ds = SyntheticDetection(length=10, image_size=32, num_classes=3)
    dl = DataLoader(ds, batch_size=4, shuffle=True, max_boxes=6, seed=7)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["images"].shape == (4, 32, 32, 3)
    # second epoch shuffles differently
    batches2 = list(dl)
    assert not np.array_equal(batches[0]["images"], batches2[0]["images"])


def test_dataloader_sharding_disjoint_and_complete():
    ds = SyntheticDetection(length=16, image_size=16, num_classes=2)
    seen = []
    for shard in range(4):
        dl = DataLoader(ds, batch_size=2, shuffle=True, max_boxes=4, seed=3,
                        shard_index=shard, num_shards=4)
        assert len(dl) == 2  # 16/4 shards -> 4 samples -> 2 batches
        idx_batches = list(dl._batch_indices())
        seen.extend(np.concatenate(idx_batches).tolist())
    # all shards together cover the dataset exactly once
    assert sorted(seen) == list(range(16))


def test_dataloader_ram_cache_exact_and_hit(voc_root, monkeypatch):
    """cache='ram' must (a) produce bit-identical batches to the uncached
    path (the uint8 round trip is lossless for 8-bit decodes) and (b) stop
    touching the decoder after the first epoch."""
    from efficientdet_tpu.data import VOCDetection, eval_transforms
    from efficientdet_tpu.data.voc import VOCDetection as VD

    tf = eval_transforms(64)
    ds = VOCDetection(voc_root, image_sets=[("2007", "trainval")],
                      transform=tf)
    plain = list(DataLoader(ds, batch_size=2, shuffle=True, max_boxes=4,
                            seed=5, cache="off"))

    calls = {"n": 0}
    orig = VD.load_image

    def counting(self, i):
        calls["n"] += 1
        return orig(self, i)

    monkeypatch.setattr(VD, "load_image", counting)
    dl = DataLoader(ds, batch_size=2, shuffle=True, max_boxes=4, seed=5,
                    cache="ram")
    cached = list(dl)
    assert calls["n"] == 2                       # one decode per image
    for a, b in zip(plain, cached):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["annotations"], b["annotations"])
    list(dl)                                     # epoch 2: pure cache
    assert calls["n"] == 2

    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=2, cache="disk")


def test_device_normalize_path_matches_host_normalizer():
    """The uint8 device-normalize input path must reproduce the host
    Normalizer exactly: collate(uint8) -> maybe_normalize_images ==
    Normalizer on the same pixels; float batches pass through untouched."""
    import jax.numpy as jnp
    from efficientdet_tpu.data.transforms import (Normalizer,
                                                  train_transforms)
    from efficientdet_tpu.train import maybe_normalize_images

    rng = np.random.RandomState(3)
    img8 = rng.randint(0, 256, (32, 32, 3), np.uint8)
    sample = {"img": img8, "annot": np.zeros((0, 5), np.float32),
              "scale": 1.0}
    batch = collate([sample], max_boxes=4, uint8_images=True)
    assert batch["images"].dtype == np.uint8
    dev = np.asarray(maybe_normalize_images(jnp.asarray(batch["images"])))
    host = Normalizer()({"img": img8.astype(np.float32) / 255.0,
                         "annot": sample["annot"]})["img"]
    np.testing.assert_allclose(dev[0], host, rtol=0, atol=1e-6)

    f32 = jnp.ones((1, 8, 8, 3), jnp.float32)
    assert maybe_normalize_images(f32) is f32   # float = already normalized

    # device_normalize transforms: no Normalizer, uint8 survives flip/resize
    tf = train_transforms(32, flip_prob=1.0, seed=0, device_normalize=True)
    out = tf({"img": img8, "annot": np.array([[2, 2, 10, 10, 1]], np.float32),
              "scale": 1.0})
    assert out["img"].dtype == np.uint8
    np.testing.assert_array_equal(out["img"], img8[:, ::-1])  # pure flip


def test_synthetic_boxes_match_pixels():
    ds = SyntheticDetection(length=2, image_size=64, num_classes=5, seed=3)
    s = ds[0]
    for x1, y1, x2, y2, lbl in s["annot"]:
        x1, y1, x2, y2 = map(int, (x1, y1, x2, y2))
        region = s["img"][y1:y2, x1:x2]
        assert region.min() >= 0.3  # painted rectangle is bright


VOC_XML = """<annotation>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object>
    <name>dog</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
  </object>
  <object>
    <name>cat</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>5</xmax><ymax>5</ymax></bndbox>
  </object>
</annotation>"""


@pytest.fixture
def voc_root(tmp_path):
    base = tmp_path / "VOC2007"
    (base / "Annotations").mkdir(parents=True)
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "JPEGImages").mkdir(parents=True)
    for img_id in ["000001", "000002"]:
        (base / "Annotations" / f"{img_id}.xml").write_text(VOC_XML)
        img = (np.random.RandomState(0).rand(80, 100, 3) * 255).astype("uint8")
        cv2.imwrite(str(base / "JPEGImages" / f"{img_id}.jpg"), img)
    (base / "ImageSets" / "Main" / "trainval.txt").write_text(
        "000001\n000002\n")
    return str(tmp_path)


def test_synthetic_load_annotations_original_resolution():
    """load_annotations must return ORIGINAL-resolution GT (VOC/COCO
    contract): evaluate_model divides detections by scale before matching,
    so post-transform boxes would mis-score when image_size != input_size."""
    ds = SyntheticDetection(length=2, image_size=256, num_classes=4,
                            transform=eval_transforms(128), seed=3)
    sample = ds[0]
    assert sample["img"].shape == (128, 128, 3)
    assert sample["scale"] == pytest.approx(0.5)
    raw = ds.load_annotations(0)
    np.testing.assert_allclose(sample["annot"][:, :4], raw[:, :4] * 0.5,
                               rtol=1e-6)
    np.testing.assert_array_equal(sample["annot"][:, 4], raw[:, 4])


def test_prefetch_iter_reraises_worker_exception():
    """Worker exceptions must crash the consumer loudly, not truncate the
    stream (a silently-partial eval would report wrong metrics)."""
    from efficientdet_tpu.data.loader import prefetch_iter

    def gen():
        yield 1
        yield 2
        raise ValueError("decode failed")

    it = prefetch_iter(gen(), depth=1)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_dataloader_propagates_dataset_errors():
    class Broken(SyntheticDetection):
        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("bad sample")
            return super().__getitem__(i)

    ds = Broken(length=4, image_size=64, num_classes=2,
                transform=eval_transforms(64))
    loader = DataLoader(ds, batch_size=2, shuffle=False, max_boxes=4)
    with pytest.raises(RuntimeError, match="bad sample"):
        list(loader)


def test_parse_voc_xml(voc_root):
    path = os.path.join(voc_root, "VOC2007", "Annotations", "000001.xml")
    out = parse_voc_xml(path)
    assert out.shape == (1, 5)  # difficult cat skipped
    np.testing.assert_allclose(out[0], [9, 19, 49, 59, 11])  # dog=11, -1 shift
    both = parse_voc_xml(path, keep_difficult=True)
    assert both.shape == (2, 5)


def test_voc_dataset(voc_root):
    ds = VOCDetection(voc_root, image_sets=[("2007", "trainval")],
                      transform=eval_transforms(64))
    assert len(ds) == 2
    s = ds[0]
    assert s["img"].shape == (64, 64, 3)
    assert s["annot"].shape == (1, 5)
    assert ds.num_classes() == 20
    assert ds.label_to_name(11) == "dog"


@pytest.fixture
def coco_root(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir(parents=True)
    data = {
        "images": [{"id": 7, "file_name": "a.jpg", "width": 100, "height": 80}],
        "categories": [{"id": 5, "name": "cat"}, {"id": 18, "name": "dog"}],
        "annotations": [
            {"image_id": 7, "category_id": 18, "bbox": [10, 20, 30, 30],
             "iscrowd": 0},
            {"image_id": 7, "category_id": 5, "bbox": [0, 0, 0.5, 10],
             "iscrowd": 0},  # degenerate
            {"image_id": 7, "category_id": 5, "bbox": [1, 1, 10, 10],
             "iscrowd": 1},  # crowd
        ],
    }
    (root / "annotations" / "instances_val2017.json").write_text(
        json.dumps(data))
    img = (np.random.RandomState(1).rand(80, 100, 3) * 255).astype("uint8")
    cv2.imwrite(str(root / "val2017" / "a.jpg"), img)
    return str(root)


def test_coco_dataset(coco_root):
    ds = CocoDataset(coco_root, set_name="val2017")
    assert len(ds) == 1
    ann = ds.load_annotations(0)
    assert ann.shape == (1, 5)  # crowd + degenerate skipped
    np.testing.assert_allclose(ann[0], [10, 20, 40, 50, 1])  # dog -> label 1
    assert ds.label_to_coco_label[1] == 18
    assert ds.num_classes() == 2
    s = ds[0]
    assert s["img"].shape == (80, 100, 3)
    assert abs(ds.image_aspect_ratio(0) - 100 / 80) < 1e-6


def test_train_transforms_pipeline():
    ds = SyntheticDetection(length=2, image_size=96, num_classes=4,
                            transform=train_transforms(64, photometric=True,
                                                       seed=0))
    s = ds[0]
    assert s["img"].shape == (64, 64, 3)
    assert s["scale"] == 64 / 96


def test_voc_to_coco_converter_roundtrip(voc_root, tmp_path):
    """tools/voc_to_coco.py: the converted COCO index must yield the same
    images and (xyxy, label) annotations as the source VOC dataset."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "voc_to_coco", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "voc_to_coco.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "coco")
    stats = mod.convert(voc_root, "trainval", out, "val2017")
    assert stats["images"] == 2

    voc = VOCDetection(voc_root, image_sets=[("2007", "trainval")])
    coco = CocoDataset(out, set_name="val2017")
    assert len(coco) == len(voc) == 2
    for i in range(2):
        v = voc.load_annotations(i)
        c = coco.load_annotations(i)
        np.testing.assert_allclose(c[:, :4], v[:, :4], atol=1e-6)
        np.testing.assert_array_equal(c[:, 4], v[:, 4])
        assert coco.label_names[int(c[0, 4])] == voc.label_to_name(
            int(v[0, 4]))
