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
