"""Parity: Pallas-accelerated conv trunk vs the generic XLA conv path."""
import numpy as np

import jax
import jax.numpy as jnp

from svtpu.ops.conv import Conv2dTorch
from svtpu.ops.conv_trunk_pallas import conv0_polyphase, fused_conv01


def _rand(rng, *shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


def test_conv0_polyphase_matches_direct():
    """The four stride-4 polyphase convs must reassemble exactly into
    conv0's zero-padded output domain."""
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, 256, 256, 3)
    w0 = _rand(rng, 3, 3, 3, 64, scale=0.1)
    b0 = _rand(rng, 64)
    conv = Conv2dTorch(64, 3, 2, 1)
    ref = conv.apply({"params": {"kernel": w0, "bias": b0}}, x)
    refp = np.pad(np.asarray(ref), ((0, 0), (1, 1), (1, 1), (0, 0)))

    ME, MO = conv0_polyphase(x, w0, b0, jnp.float32)
    ME, MO = np.asarray(ME), np.asarray(MO)
    # MO[a, b]: q = (2a-1, 2b-1+cp) → padded index q+1.
    for a in (0, 1, 33, 64):
        for b in (0, 17, 64):
            np.testing.assert_allclose(
                MO[:, a, b, :64], refp[:, 2 * a, 2 * b, :],
                rtol=1e-5, atol=1e-5)
            if b < 64:
                np.testing.assert_allclose(
                    MO[:, a, b, 64:], refp[:, 2 * a, 2 * b + 1, :],
                    rtol=1e-5, atol=1e-5)
    for a in (0, 31, 63):
        for b in (0, 40, 64):
            np.testing.assert_allclose(
                ME[:, a, b, :64], refp[:, 2 * a + 1, 2 * b, :],
                rtol=1e-5, atol=1e-5)


def test_fused_conv01_matches_xla_interpret():
    rng = np.random.default_rng(1)
    B = 2
    x = _rand(rng, B, 256, 256, 3)
    w0 = _rand(rng, 3, 3, 3, 64, scale=0.1)
    w1 = _rand(rng, 3, 3, 64, 64, scale=0.05)
    b0, b1 = _rand(rng, 64), _rand(rng, 64)

    conv = Conv2dTorch(64, 3, 2, 1)
    h = conv.apply({"params": {"kernel": w0, "bias": b0}}, x)
    h = conv.apply({"params": {"kernel": w1, "bias": b1}}, jax.nn.relu(h))
    ref = jax.nn.relu(h)

    out = fused_conv01(x, w0, b0, w1, b1, interpret=True)
    assert out.shape == ref.shape == (B, 64, 64, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # Multi-image blocks (static in-kernel loop + K-concat matmuls) must
    # be numerically identical to the single-image kernel's math.
    out2 = fused_conv01(x, w0, b0, w1, b1, interpret=True, block_n=2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # Non-dividing block size falls back to the single-image grid.
    out3 = fused_conv01(x, w0, b0, w1, b1, interpret=True, block_n=3)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv01_chunked_multi(monkeypatch):
    """B past the compile-safe boundary routes through the lax.map
    chunked path and stays numerically identical."""
    from svtpu.ops import conv_trunk_pallas as ctp

    monkeypatch.setattr(ctp, "_COMPILE_SAFE_B", {2: 4, 4: 4})
    rng = np.random.default_rng(2)
    B = 8  # > limit 4 -> two lax.map chunks of 4
    x = _rand(rng, B, 256, 256, 3)
    w0 = _rand(rng, 3, 3, 3, 64, scale=0.1)
    w1 = _rand(rng, 3, 3, 64, 64, scale=0.05)
    b0, b1 = _rand(rng, 64), _rand(rng, 64)

    conv = Conv2dTorch(64, 3, 2, 1)
    h = conv.apply({"params": {"kernel": w0, "bias": b0}}, x)
    h = conv.apply({"params": {"kernel": w1, "bias": b1}}, jax.nn.relu(h))
    ref = jax.nn.relu(h)

    out = ctp.fused_conv01(x, w0, b0, w1, b1, interpret=True, block_n=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
