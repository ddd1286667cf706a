"""Pallas kernel tests (interpret mode on CPU) vs jnp references."""

import numpy as np
import jax.numpy as jnp
import pytest

from efficientdet_tpu.kernels import (fuse_bottomup_pallas, fuse_bottomup_xla,
                                      fuse_topdown_pallas, fuse_topdown_xla)


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 16, 16, 32)])
def test_fuse_topdown_matches_xla(shape):
    rng = np.random.RandomState(0)
    b, h2, w2, c = shape
    big = jnp.asarray(rng.randn(b, h2, w2, c).astype(np.float32))
    small = jnp.asarray(rng.randn(b, h2 // 2, w2 // 2, c).astype(np.float32))
    w0 = jnp.float32(0.4)
    w1 = jnp.float32(0.6)
    expected = fuse_topdown_xla(big, small, w0, w1)
    got = fuse_topdown_pallas(big, small, w0, w1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)


def test_fuse_topdown_upsample_structure():
    # constant small map -> its contribution is constant across the 2x2 block
    big = jnp.zeros((1, 4, 4, 8))
    small = jnp.ones((1, 2, 2, 8)) * 3.0
    out = fuse_topdown_pallas(big, small, jnp.float32(0.0), jnp.float32(1.0),
                              eps=0.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)


@pytest.mark.parametrize("shape", [(2, 4, 4, 16), (1, 8, 8, 32)])
def test_fuse_bottomup_matches_xla(shape):
    rng = np.random.RandomState(1)
    b, h, w, c = shape
    cur = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    lower = jnp.asarray(rng.randn(b, 2 * h, 2 * w, c).astype(np.float32))
    skip = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    w0, w1, w2 = jnp.float32(0.2), jnp.float32(0.3), jnp.float32(0.5)
    expected = fuse_bottomup_xla(cur, lower, skip, w0, w1, w2)
    got = fuse_bottomup_pallas(cur, lower, skip, w0, w1, w2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)


def test_fuse_bottomup_maxpool_structure():
    # lower map max should dominate when only w1 is nonzero
    cur = jnp.zeros((1, 2, 2, 8))
    skip = jnp.zeros((1, 2, 2, 8))
    lower = jnp.arange(1 * 4 * 4 * 8, dtype=jnp.float32).reshape(1, 4, 4, 8)
    out = fuse_bottomup_pallas(cur, lower, skip, jnp.float32(0.0),
                               jnp.float32(1.0), jnp.float32(0.0), eps=0.0,
                               interpret=True)
    expected = fuse_bottomup_xla(cur, lower, skip, jnp.float32(0.0),
                                 jnp.float32(1.0), jnp.float32(0.0), eps=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected))


# ----------------------------------------------------------- NMS kernel
def _random_candidates(rng, b, k):
    """Score-sorted candidate sets with heavy overlap (realistic NMS input)."""
    centers = rng.rand(b, k, 2).astype(np.float32) * 80
    sizes = rng.rand(b, k, 2).astype(np.float32) * 40 + 5
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=2)
    scores = np.sort(rng.rand(b, k).astype(np.float32))[:, ::-1].copy()
    # sprinkle padding (score 0) at the tail like a post-threshold top-k
    scores[:, -k // 4:] = 0.0
    return jnp.asarray(scores), jnp.asarray(boxes)


@pytest.mark.parametrize("b,k,d", [(2, 64, 8), (1, 128, 16)])
def test_nms_pallas_matches_scan(b, k, d):
    from efficientdet_tpu.kernels.nms_kernel import nms_select_pallas
    from efficientdet_tpu.ops.nms import select_and_suppress
    import jax

    rng = np.random.RandomState(7)
    scores, boxes = _random_candidates(rng, b, k)
    classes = jnp.asarray(rng.randint(0, 5, size=(b, k)).astype(np.int32))
    ref = jax.vmap(lambda s, bx, c: select_and_suppress(bx, s, c, 0.5, d))(
        scores, boxes, classes)
    out_s, out_i = nms_select_pallas(scores, boxes, 0.5, d, interpret=True)
    valid = np.asarray(out_s) > 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_allclose(np.where(valid, np.asarray(out_s), -1.0),
                               np.asarray(ref.scores), rtol=1e-6)
    got_cls = np.where(valid, np.take_along_axis(
        np.asarray(classes), np.asarray(out_i), axis=1), -1)
    np.testing.assert_array_equal(got_cls, np.asarray(ref.classes))
    got_boxes = np.where(valid[..., None], np.take_along_axis(
        np.asarray(boxes), np.asarray(out_i)[..., None], axis=1), 0.0)
    np.testing.assert_allclose(got_boxes, np.asarray(ref.boxes), rtol=1e-6)


def test_nms_pallas_all_padding():
    from efficientdet_tpu.kernels.nms_kernel import nms_select_pallas
    scores = jnp.zeros((2, 64))
    boxes = jnp.zeros((2, 64, 4))
    out_s, out_i = nms_select_pallas(scores, boxes, 0.5, 8, interpret=True)
    assert not np.any(np.asarray(out_s) > 0)


# ------------------------------------------- packed max/argmax reduction
def test_packed_max_argmax_bf16_matches_two_pass():
    from efficientdet_tpu.ops.reductions import packed_max_argmax_bf16
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 257, 80).astype(np.float32) * 5).astype(
        jnp.bfloat16)
    mx, am = packed_max_argmax_bf16(x)
    np.testing.assert_array_equal(
        np.asarray(mx, dtype=np.float32),
        np.asarray(jnp.max(x, axis=-1), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(am),
                                  np.asarray(jnp.argmax(x, axis=-1)))


def test_packed_max_argmax_bf16_ties_and_negatives():
    from efficientdet_tpu.ops.reductions import packed_max_argmax_bf16
    x = jnp.asarray([[-3.0, -1.5, -1.5, -7.0],
                     [2.5, 2.5, 1.0, 2.5],
                     [-1.0, -2.0, -3.0, -0.5]]).astype(jnp.bfloat16)
    mx, am = packed_max_argmax_bf16(x)
    np.testing.assert_array_equal(np.asarray(mx, np.float32),
                                  [-1.5, 2.5, -0.5])
    np.testing.assert_array_equal(np.asarray(am), [1, 0, 3])  # first index


# ------------------------------------------ fused MBConv expand+depthwise
def _mbconv_ref(x, we, s0, b0, wd, s1, b1, stride):
    import jax
    from efficientdet_tpu.ops.padding import same_padding_1d
    y = jnp.einsum("bhwc,ce->bhwe", x.astype(jnp.float32),
                   we.astype(jnp.float32))
    y = y * s0 + b0
    y = y * jax.nn.sigmoid(y)
    y = y.astype(x.dtype).astype(jnp.float32)
    k = wd.shape[0]
    h, w = x.shape[1:3]
    pt, pb = same_padding_1d(h, k, stride)
    pl, pr = same_padding_1d(w, k, stride)
    yp = jnp.pad(y, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    z = jax.lax.conv_general_dilated(
        yp, wd[:, :, None, :].astype(jnp.float32), (stride, stride), "VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            yp.shape, (k, k, 1, yp.shape[3]), ("NHWC", "HWIO", "NHWC")),
        feature_group_count=yp.shape[3])
    z = z * s1 + b1
    z = z * jax.nn.sigmoid(z)
    return z.astype(x.dtype), jnp.mean(z, axis=(1, 2))


@pytest.mark.parametrize("h,w,cin,ce,k,s", [
    (32, 32, 16, 96, 3, 2),    # block_1 shape class
    (32, 32, 24, 144, 3, 1),   # block_2
    (16, 16, 24, 144, 5, 2),   # block_3
    (16, 16, 40, 240, 5, 1),   # block_4
    (24, 24, 16, 96, 3, 1),    # non-power-of-2 spatial
])
@pytest.mark.parametrize("impl", ["v1", "flat"])
def test_fused_expand_dw_matches_xla(h, w, cin, ce, k, s, impl):
    from efficientdet_tpu.kernels.mbconv_kernel import (fused_expand_dw,
                                                        fused_expand_dw_flat)
    fused = fused_expand_dw if impl == "v1" else fused_expand_dw_flat
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    we = jnp.asarray(rng.randn(cin, ce).astype(np.float32) * 0.1)
    s0 = jnp.asarray(rng.rand(ce).astype(np.float32) + 0.5)
    b0 = jnp.asarray(rng.randn(ce).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.randn(k, k, ce).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.rand(ce).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(ce).astype(np.float32) * 0.1)
    zr, ser = _mbconv_ref(x, we, s0, b0, wd, s1, b1, s)
    z, se = fused(x, we, s0, b0, wd, s1, b1, stride=s, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zr),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(se), np.asarray(ser),
                               rtol=2e-5, atol=2e-5)


def test_fold_bn_affine():
    from efficientdet_tpu.kernels.mbconv_kernel import fold_bn_affine
    rng = np.random.RandomState(2)
    c = 32
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32))
    mean = jnp.asarray(rng.randn(c).astype(np.float32))
    var = jnp.asarray(rng.rand(c).astype(np.float32) + 0.1)
    eps = 1e-3
    scale, bias = fold_bn_affine(gamma, beta, mean, var, eps)
    x = jnp.asarray(rng.randn(5, c).astype(np.float32))
    expected = (x - mean) / jnp.sqrt(var + eps) * gamma + beta
    np.testing.assert_allclose(np.asarray(x * scale + bias),
                               np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_fused_backbone_batch_fence():
    """Compiled (non-interpret) fused serving must refuse batches beyond
    the validated bound BEFORE any Pallas launch — larger grids hard-fault
    the TPU (VERDICT r3 weak #1; BENCH_MODES.json fusedmb b128/b256). The
    fence fires on the host from static shapes, so no device is touched."""
    import pytest
    from efficientdet_tpu.models.fused_serving import (FUSED_MAX_BATCH,
                                                       fused_backbone_forward)
    x = jnp.zeros((FUSED_MAX_BATCH + 1, 128, 128, 3), jnp.float32)
    with pytest.raises(ValueError, match="validated up to batch"):
        fused_backbone_forward({}, x, "efficientnet-b0", interpret=False)


@pytest.mark.slow  # full-backbone compile (XLA ref path)
def test_fused_backbone_matches_flax(monkeypatch):
    """fused_serving.fused_backbone_forward must reproduce the flax
    backbone's frozen-BN feature pyramid from the SAME variables tree."""
    import jax
    from efficientdet_tpu.models import EfficientNetFeatures
    from efficientdet_tpu.models.fused_serving import fused_backbone_forward

    size = 128  # smallest input the 7-stage stride-128 pyramid supports
    model = EfficientNetFeatures(model_name="efficientnet-b0",
                                 dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # randomized BN stats so the affine fold is non-trivial
    variables = jax.tree.map(np.asarray, variables)

    def _randomize(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                node["mean"] = rng.randn(*node["mean"].shape).astype(
                    np.float32) * 0.3
                node["var"] = rng.rand(*node["var"].shape).astype(
                    np.float32) + 0.5
            else:
                for v in node.values():
                    _randomize(v)

    _randomize(variables["batch_stats"])
    ref = model.apply(variables, x, False)
    # fused reader expects the ("backbone", ...) nesting the detector uses
    nested = {"params": {"backbone": variables["params"]},
              "batch_stats": {"batch_stats": None}}
    nested["batch_stats"] = {"backbone": variables["batch_stats"]}
    got = fused_backbone_forward(nested, x, "efficientnet-b0",
                                 dtype=jnp.float32, interpret=True)
    assert len(got) == len(ref) == 7
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"stage {i}")
