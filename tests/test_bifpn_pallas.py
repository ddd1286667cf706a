"""Pallas-fused BiFPN must match the XLA path numerically (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientdet_tpu.models import BiFPN
from jax.experimental.pallas import tpu as pltpu


def test_bifpn_pallas_matches_xla():
    chans = [40, 80, 112, 192, 320]
    sizes = [16, 8, 4, 2, 1]
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, s, s, c).astype(np.float32))
             for s, c in zip(sizes, chans)]
    xla_neck = BiFPN(in_channels=chans, out_channels=64, stack=2,
                     use_pallas=False)
    pal_neck = BiFPN(in_channels=chans, out_channels=64, stack=2,
                     use_pallas=True)
    params = xla_neck.init(jax.random.PRNGKey(0), feats)
    base = xla_neck.apply(params, feats)
    with pltpu.force_tpu_interpret_mode():
        fused = pal_neck.apply(params, feats)
    for i, (a, b) in enumerate(zip(base, fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5, err_msg=f"level {i}")
