"""AutoencoderKL parity: our JAX model + converter vs an independently
written torch twin of the SD first-stage architecture (GroupNorm eps,
asymmetric downsample padding, single-head attention scaling — the exact
pitfalls SURVEY.md §7 flags). Uses a tiny config so it runs fast on CPU;
the architecture generator is identical to the full-size one.

Authoritative parity now lives in test_reference_parity.py, which imports
the GENUINE vendored reference modules; this twin remains as a fast
self-contained cross-check plus the attention-kernel unit tests."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from svtpu.config import PerceptualConfig
from svtpu.models.autoencoder_kl import AutoencoderKL, DiagonalGaussian
from svtpu.ops.attention import blocked_attention, flash_attention
from svtpu.perceptual.convert import convert_autoencoder_kl

TINY = PerceptualConfig(embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, compute_dtype="float32")


# ---------------------------------------------------------------- torch twin

class TRes(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(tF.silu(self.norm1(x)))
        h = self.conv2(tF.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(32, c, eps=1e-6)
        for n in ("q", "k", "v", "proj_out"):
            setattr(self, n, tnn.Conv2d(c, c, 1))

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, w = q.shape
        qf = q.reshape(b, c, hh * w).permute(0, 2, 1)
        kf = k.reshape(b, c, hh * w)
        att = torch.softmax(torch.bmm(qf, kf) * (c ** -0.5), dim=2)
        vf = v.reshape(b, c, hh * w)
        out = torch.bmm(vf, att.permute(0, 2, 1)).reshape(b, c, hh, w)
        return x + self.proj_out(out)


class TDown(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, 2, 0)

    def forward(self, x):
        return self.conv(tF.pad(x, (0, 1, 0, 1)))


class TUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return self.conv(tF.interpolate(x, scale_factor=2.0, mode="nearest"))


class TLevel(tnn.Module):
    pass


class TMid(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.block_1 = TRes(c, c)
        self.attn_1 = TAttn(c)
        self.block_2 = TRes(c, c)

    def forward(self, x):
        return self.block_2(self.attn_1(self.block_1(x)))


class TEncoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.conv_in = tnn.Conv2d(cfg.in_channels, cfg.ch, 3, 1, 1)
        self.down = tnn.ModuleList()
        cin = cfg.ch
        for i, m in enumerate(cfg.ch_mult):
            lvl = TLevel()
            blocks = tnn.ModuleList()
            for _ in range(cfg.num_res_blocks):
                blocks.append(TRes(cin, cfg.ch * m))
                cin = cfg.ch * m
            lvl.block = blocks
            if i != len(cfg.ch_mult) - 1:
                lvl.downsample = TDown(cin)
            self.down.append(lvl)
        self.mid = TMid(cin)
        self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv_out = tnn.Conv2d(cin, 2 * cfg.z_channels, 3, 1, 1)

    def forward(self, x):
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            for b in lvl.block:
                h = b(h)
            if hasattr(lvl, "downsample"):
                h = lvl.downsample(h)
        h = self.mid(h)
        return self.conv_out(tF.silu(self.norm_out(h)))


class TDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        cin = cfg.ch * cfg.ch_mult[-1]
        self.conv_in = tnn.Conv2d(cfg.z_channels, cin, 3, 1, 1)
        self.mid = TMid(cin)
        self.up = tnn.ModuleList([TLevel() for _ in cfg.ch_mult])
        for i in reversed(range(len(cfg.ch_mult))):
            lvl = self.up[i]
            cout = cfg.ch * cfg.ch_mult[i]
            blocks = tnn.ModuleList()
            for _ in range(cfg.num_res_blocks + 1):
                blocks.append(TRes(cin, cout))
                cin = cout
            lvl.block = blocks
            if i != 0:
                lvl.upsample = TUp(cin)
        self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv_out = tnn.Conv2d(cin, cfg.out_ch, 3, 1, 1)

    def forward(self, z):
        h = self.mid(self.conv_in(z))
        for i in reversed(range(len(self.up))):
            lvl = self.up[i]
            for b in lvl.block:
                h = b(h)
            if hasattr(lvl, "upsample"):
                h = lvl.upsample(h)
        return self.conv_out(tF.silu(self.norm_out(h)))


class TAutoencoderKL(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        self.quant_conv = tnn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)


# -------------------------------------------------------------------- tests

@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    return TAutoencoderKL(TINY).eval()


def _jax_params(twin):
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    return convert_autoencoder_kl(sd, TINY, prefix="")


def test_encoder_parity(twin):
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = twin.quant_conv(twin.encoder(x)).numpy()
    model = AutoencoderKL(TINY)
    params = _jax_params(twin)
    got = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      method=AutoencoderKL.encode)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == expected.shape == (2, 8, 16, 16)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_decoder_parity(twin):
    z = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        expected = twin.decoder(twin.post_quant_conv(z)).numpy()
    model = AutoencoderKL(TINY)
    params = _jax_params(twin)
    got = model.apply(params, jnp.asarray(z.numpy().transpose(0, 2, 3, 1)),
                      method=AutoencoderKL.decode)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == expected.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_diagonal_gaussian():
    rng = np.random.default_rng(0)
    moments = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    post = DiagonalGaussian.from_moments(jnp.asarray(moments))
    mean, logvar = np.split(moments, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(post.mode()), mean)
    kl = 0.5 * np.sum(mean ** 2 + np.exp(logvar) - 1 - logvar, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(post.kl()), kl, rtol=1e-4)
    z = post.sample(jax.random.key(0))
    assert z.shape == mean.shape


def test_blocked_attention_matches_naive():
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 100, 32)), jnp.float32)
               for _ in range(3))
    naive = jax.nn.softmax(
        jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(32), axis=-1)
    naive = jnp.einsum("bqk,bkd->bqd", naive, v)
    got = blocked_attention(q, k, v, chunk=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_interpret_matches_blocked():
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.float32)
               for _ in range(3))
    ref = blocked_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_attention_custom_vjp_matches_autodiff():
    """Chunked recompute backward == autodiff through naive attention."""
    from svtpu.ops.attention import attention

    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 96, 32)), np.float32)
               for _ in range(3))

    def naive(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(32)
        return jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, -1), v)

    def loss_ours(q, k, v):
        return jnp.sum(attention(q, k, v, use_pallas=False) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(naive(q, k, v) ** 2)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_autoencoder_grad_flows(twin):
    """End-to-end grads through the JAX AE (incl. attention VJP)."""
    model = AutoencoderKL(TINY)
    params = _jax_params(twin)
    x = jnp.asarray(np.random.default_rng(6).normal(
        size=(1, 32, 32, 3)).astype(np.float32))

    def loss(p):
        m = model.apply(p, x, method=AutoencoderKL.encode)
        return jnp.mean(m ** 2)

    g = jax.grad(loss)(params)
    tot = sum(float(jnp.sum(jnp.abs(l)))
              for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(tot) and tot > 0
