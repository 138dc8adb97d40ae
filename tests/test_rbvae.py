"""Shape/dtype/semantics tests for the four RBVAE variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svtpu.config import rbvae_variant
from svtpu.models.rbvae import Seq2SeqBinaryVAE

CASES = [
    # (variant, input [T,H,W,C] spatial, latent)
    ("simple", (64, 64, 3), 16),
    ("contrastive", (32, 32, 3), 12),   # shrunken spatial for test speed
    ("triplet", (32, 32, 3), 12),
    ("percep", (24, 40, 4), 12),
]


def make(variant, hwc, latent):
    cfg = rbvae_variant(variant, latent_dim=latent, input_hw=hwc[:2],
                        in_channels=hwc[2], out_channels=hwc[2])
    return cfg, Seq2SeqBinaryVAE(cfg)


@pytest.mark.parametrize("variant,hwc,latent", CASES)
def test_forward_shapes(variant, hwc, latent):
    cfg, model = make(variant, hwc, latent)
    B, T = 2, 4
    x = jnp.zeros((B, T) + hwc, jnp.float32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "binary": jax.random.key(2)}
    params = model.init(rngs, x, 1.0, False)
    out = model.apply(params, x, 0.7, False,
                      rngs={"dropout": jax.random.key(3),
                            "binary": jax.random.key(4)})
    assert out.x_recon.shape == x.shape
    assert out.h_seq.shape == (B, T, latent)
    assert out.z_seq.shape == (B, T, latent)
    assert out.logits.shape == (B, T, latent)
    assert np.all(np.isfinite(np.asarray(out.x_recon)))


def test_encode_hard_is_binary_and_deterministic():
    cfg, model = make("contrastive", (32, 32, 3), 10)
    x = jax.random.normal(jax.random.key(5), (1, 3, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x, 1.0, False,
                        deterministic=True)
    z1 = model.apply(params, x, 0.2, True, method=Seq2SeqBinaryVAE.encode)
    z2 = model.apply(params, x, 0.2, True, method=Seq2SeqBinaryVAE.encode)
    z1, z2 = np.asarray(z1), np.asarray(z2)
    assert set(np.unique(z1)) <= {0.0, 1.0}
    np.testing.assert_array_equal(z1, z2)


def test_encode_with_noise_varies_by_key():
    cfg, model = make("contrastive", (32, 32, 3), 10)
    x = jax.random.normal(jax.random.key(6), (1, 3, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x, 1.0, False,
                        deterministic=True)
    z1 = model.apply(params, x, 0.5, False, 0.5,
                     method=Seq2SeqBinaryVAE.encode,
                     deterministic=False, bc_rng=jax.random.key(1))
    z2 = model.apply(params, x, 0.5, False, 0.5,
                     method=Seq2SeqBinaryVAE.encode,
                     deterministic=False, bc_rng=jax.random.key(2))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_simple_variant_binarizes_before_rnn():
    """For the simple variant z_seq must be binary_concrete(logits), i.e. a
    function of conv logits only (reference ``simple_RBVAE_model.py:177``)."""
    cfg, model = make("simple", (64, 64, 3), 8)
    x = jax.random.normal(jax.random.key(7), (1, 2, 64, 64, 3))
    params = model.init({"params": jax.random.key(0)}, x, 1.0, False,
                        deterministic=True)
    out = model.apply(params, x, 0.5, False, deterministic=True)
    expect = jax.nn.sigmoid(out.logits / 0.5)
    np.testing.assert_allclose(np.asarray(out.z_seq), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_grad_flows_through_hard_binarization():
    cfg, model = make("contrastive", (32, 32, 3), 8)
    x = jax.random.normal(jax.random.key(8), (1, 2, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x, 1.0, False,
                        deterministic=True)

    def loss_fn(p):
        out = model.apply(p, x, 0.5, True, deterministic=True)
        return jnp.mean((out.x_recon - x) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_remat_variant_matches_nonremat():
    """remat=True must be numerically identical to remat=False."""
    cfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    cfg_r = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32),
                          remat=True)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32, 3))
    m, mr = Seq2SeqBinaryVAE(cfg), Seq2SeqBinaryVAE(cfg_r)
    p = m.init({"params": jax.random.key(1)}, x, 1.0, False,
               deterministic=True)
    out = m.apply(p, x, 0.5, False, deterministic=True)
    out_r = mr.apply(p, x, 0.5, False, deterministic=True)
    np.testing.assert_allclose(np.asarray(out.x_recon),
                               np.asarray(out_r.x_recon), rtol=1e-5,
                               atol=1e-6)


def test_conv0_s2d_matches_plain_conv():
    """conv0_s2d=True (space-to-depth first conv) must be numerically
    identical to the plain k3/s2/p1 conv — same params, same math, only
    the MXU-facing layout differs (ops/conv.py::_conv_s2d_k3s2p1)."""
    from svtpu.ops.conv import Conv2dTorch

    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    plain = Conv2dTorch(16, 3, 2, 1)
    s2d = Conv2dTorch(16, 3, 2, 1, s2d=True)
    p = plain.init(jax.random.key(1), x)
    y0 = plain.apply(p, x)
    y1 = s2d.apply(p, x)
    assert y1.shape == y0.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)

    # Gradients agree too (the transform is linear in both x and w).
    g0 = jax.grad(lambda v: jnp.sum(plain.apply(v, x) ** 2))(p)
    g1 = jax.grad(lambda v: jnp.sum(s2d.apply(v, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # Whole-model wiring: identical encode codes either way.
    cfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    cfg_s = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32),
                          conv0_s2d=True)
    xs = jax.random.normal(jax.random.key(2), (2, 3, 32, 32, 3))
    m, ms = Seq2SeqBinaryVAE(cfg), Seq2SeqBinaryVAE(cfg_s)
    par = m.init({"params": jax.random.key(3)}, xs, 1.0, False,
                 deterministic=True)
    z0 = m.apply(par, xs, 0.5, True, method=Seq2SeqBinaryVAE.encode,
                 deterministic=True)
    z1 = ms.apply(par, xs, 0.5, True, method=Seq2SeqBinaryVAE.encode,
                  deterministic=True)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))


def test_int8_trunk_close_and_wired():
    """conv2d_int8 (dynamic symmetric int8) approximates the f32 conv
    within quantization tolerance, and the int8_trunk flag routes the
    encode path through it with the same params/shapes. Quantized ≠
    bit-exact by construction — the per-checkpoint code-mismatch is a
    measured quantity (bench suite), not a test invariant."""
    from svtpu.ops.conv import conv2d_int8, conv2d_torch_apply

    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 16, 16, 64))
    w = jax.random.normal(jax.random.key(1), (3, 3, 64, 32)) * 0.1
    b = jax.random.normal(jax.random.key(2), (32,)) * 0.01
    y32 = conv2d_torch_apply(x, w, b, 2, 1, jnp.float32)
    y8 = conv2d_int8(x, w, b, 2, 1, jnp.float32)
    assert y8.shape == y32.shape
    rel = (np.abs(np.asarray(y8 - y32)).mean()
           / np.abs(np.asarray(y32)).mean())
    assert rel < 0.02, rel        # ~1% expected for 576-long int8 dots

    cfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    cfg_q = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32),
                          int8_trunk=True)
    xs = jax.random.normal(jax.random.key(3), (2, 3, 32, 32, 3))
    m, mq = Seq2SeqBinaryVAE(cfg), Seq2SeqBinaryVAE(cfg_q)
    par = m.init({"params": jax.random.key(4)}, xs, 1.0, False,
                 deterministic=True)
    z0 = m.apply(par, xs, 0.5, True, method=Seq2SeqBinaryVAE.encode,
                 deterministic=True)
    z1 = mq.apply(par, xs, 0.5, True, method=Seq2SeqBinaryVAE.encode,
                  deterministic=True)
    assert z1.shape == z0.shape
    # Hard codes from the SAME params should mostly agree even at random
    # init (logits near zero = the worst case for quantization flips).
    agree = float((np.asarray(z0) == np.asarray(z1)).mean())
    assert agree > 0.9, agree


def test_deconv_d2s_matches_plain_transposed_conv():
    """deconv_d2s (sub-pixel transposed conv) must be numerically identical
    to the dilated-forward formulation — same params, same math
    (ops/conv.py::_deconv_d2s_k3s2p1)."""
    from svtpu.ops.conv import ConvTranspose2dTorch

    x = jax.random.normal(jax.random.key(0), (2, 9, 13, 5))
    plain = ConvTranspose2dTorch(7, 3, 2, 1, 1)
    d2s = ConvTranspose2dTorch(7, 3, 2, 1, 1, d2s=True)
    p = plain.init(jax.random.key(1), x)
    y0 = plain.apply(p, x)
    y1 = d2s.apply(p, x)
    assert y1.shape == y0.shape == (2, 18, 26, 7)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)

    g0 = jax.grad(lambda v: jnp.sum(plain.apply(v, x) ** 2))(p)
    g1 = jax.grad(lambda v: jnp.sum(d2s.apply(v, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # Whole-model wiring: identical reconstruction either way.
    cfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    cfg_d = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32),
                          deconv_d2s=True)
    xs = jax.random.normal(jax.random.key(2), (2, 3, 32, 32, 3))
    m, md = Seq2SeqBinaryVAE(cfg), Seq2SeqBinaryVAE(cfg_d)
    par = m.init({"params": jax.random.key(3)}, xs, 1.0, False,
                 deterministic=True)
    r0 = m.apply(par, xs, 0.5, False, deterministic=True).x_recon
    r1 = md.apply(par, xs, 0.5, False, deterministic=True).x_recon
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-5, atol=1e-6)
