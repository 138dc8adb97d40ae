"""Parity: fused Pallas conv trunk vs the generic XLA Conv2dTorch path."""
import numpy as np

import jax
import jax.numpy as jnp

from svtpu.ops.conv import Conv2dTorch
from svtpu.ops.conv_trunk_pallas import fused_trunk23


def _xla_trunk(h0, w1, b1, w2, b2):
    conv = Conv2dTorch(64, 3, 2, 1)
    x = jax.nn.relu(h0)
    h = conv.apply({"params": {"kernel": w1, "bias": b1}}, x)
    h = jax.nn.relu(h)
    return conv.apply({"params": {"kernel": w2, "bias": b2}}, h)


def test_fused_trunk_matches_xla_interpret():
    rng = np.random.default_rng(0)
    B = 2
    h0 = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(64,)), jnp.float32)

    ref = _xla_trunk(h0, w1, b1, w2, b2)
    out = fused_trunk23(h0, w1, b1, w2, b2, interpret=True)
    assert out.shape == ref.shape == (B, 32, 32, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
