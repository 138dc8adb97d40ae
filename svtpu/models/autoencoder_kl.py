"""AutoencoderKL — the Stable-Diffusion perceptual autoencoder, in JAX.

Re-designed from the behavior of the vendored CompVis first stage
(reference ``ldm/models/autoencoder.py:285-423``, backbones
``ldm/modules/diffusionmodules/model.py:368-568``, gaussian
``ldm/modules/distributions/distributions.py:24-62``): only the live path —
Encoder/Decoder/DiagonalGaussian/quant convs — is rebuilt; the UNet, CLIP
conditioning, EMA, and samplers the reference instantiates but never uses
for embeddings (SURVEY.md §2.8) are deliberately absent.

TPU-first choices:
  * NHWC everywhere; GroupNorm(32, eps=1e-6) over the channel axis.
  * The mid-block single-head attention uses the Pallas flash kernel
    (``svtpu.ops.attention``) — the 88x160-token score matrix never
    materializes in HBM.
  * bf16 compute / f32 params by default; the GroupNorm statistics are
    computed in f32 for stability.
  * Asymmetric (0,1,0,1) downsample padding preserved exactly
    (``diffusionmodules/model.py:60-79``) so torch weights port 1:1.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from svtpu.config import PerceptualConfig
from svtpu.ops.attention import attention


def _conv(features, kernel=3, stride=1, padding=1, name=None,
          dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((padding, padding), (padding, padding)),
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class GroupNormSiLU(nn.Module):
    """GroupNorm(32, eps 1e-6) + optional SiLU, f32 statistics."""

    silu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm")(
                             x.astype(jnp.float32))
        if self.silu:
            h = jax.nn.silu(h)
        return h.astype(self.dtype)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNormSiLU(dtype=self.dtype, name="norm1")(x)
        h = _conv(self.out_ch, name="conv1", dtype=self.dtype)(h)
        h = GroupNormSiLU(dtype=self.dtype, name="norm2")(h)
        h = _conv(self.out_ch, name="conv2", dtype=self.dtype)(h)
        if x.shape[-1] != self.out_ch:
            x = _conv(self.out_ch, kernel=1, padding=0, name="nin_shortcut",
                      dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head attention over spatial tokens, 1x1-conv projections."""

    dtype: jnp.dtype = jnp.float32
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNormSiLU(silu=False, dtype=self.dtype, name="norm")(x)
        q = _conv(C, 1, 1, 0, name="q", dtype=self.dtype)(h)
        k = _conv(C, 1, 1, 0, name="k", dtype=self.dtype)(h)
        v = _conv(C, 1, 1, 0, name="v", dtype=self.dtype)(h)
        q, k, v = (a.reshape(B, H * W, C) for a in (q, k, v))
        o = attention(q, k, v, use_pallas=self.use_pallas)
        o = o.reshape(B, H, W, C)
        o = _conv(C, 1, 1, 0, name="proj_out", dtype=self.dtype)(o)
        return x + o


class Downsample(nn.Module):
    """Asymmetric (0,1,0,1) pad + stride-2 conv (model.py:60-79)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(C, 3, 2, 0, name="conv", dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest 2x + conv3x3 (model.py:42-57)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(C, 3, 1, 1, name="conv", dtype=self.dtype)(x)


class Encoder(nn.Module):
    cfg: PerceptualConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        h = _conv(c.ch, name="conv_in", dtype=dtype)(x.astype(dtype))
        for i, mult in enumerate(c.ch_mult):
            for b in range(c.num_res_blocks):
                h = ResnetBlock(c.ch * mult, dtype=dtype,
                                name=f"down_{i}_block_{b}")(h)
            if i != len(c.ch_mult) - 1:
                h = Downsample(dtype=dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=dtype, name="mid_block_2")(h)
        h = GroupNormSiLU(dtype=dtype, name="norm_out")(h)
        h = _conv(2 * c.z_channels, name="conv_out", dtype=dtype)(h)
        return h


class Decoder(nn.Module):
    cfg: PerceptualConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        block_in = c.ch * c.ch_mult[-1]
        h = _conv(block_in, name="conv_in", dtype=dtype)(z.astype(dtype))
        h = ResnetBlock(block_in, dtype=dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=dtype, name="mid_block_2")(h)
        for rev, i in enumerate(reversed(range(len(c.ch_mult)))):
            out_ch = c.ch * c.ch_mult[i]
            # Decoder uses num_res_blocks + 1 blocks per level (model.py:511).
            for b in range(c.num_res_blocks + 1):
                h = ResnetBlock(out_ch, dtype=dtype,
                                name=f"up_{i}_block_{b}")(h)
            if i != 0:
                h = Upsample(dtype=dtype, name=f"up_{i}_upsample")(h)
        h = GroupNormSiLU(dtype=dtype, name="norm_out")(h)
        h = _conv(c.out_ch, name="conv_out", dtype=dtype)(h)
        return h


class DiagonalGaussian(NamedTuple):
    """Moments of the encoder posterior
    (``ldm/modules/distributions/distributions.py:24-62``)."""

    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_moments(cls, moments: jax.Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(self.mean ** 2 + var - 1.0 - self.logvar,
                             axis=(1, 2, 3))

    def nll(self, sample: jax.Array) -> jax.Array:
        var = jnp.exp(self.logvar)
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / var,
            axis=(1, 2, 3))


class AutoencoderKL(nn.Module):
    """Encoder + quant convs + Decoder (``ldm/models/autoencoder.py:285-333``).

    ``encode`` returns posterior moments (apply ``DiagonalGaussian``);
    ``decode`` maps latents back to pixels. The 0.18215 ``scale_factor``
    applied by ``get_first_stage_encoding`` (``ddpm.py:542-549``) lives in
    ``svtpu.perceptual.embed``, not here, mirroring the reference split.
    """

    cfg: PerceptualConfig = PerceptualConfig()

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.encoder = Encoder(c, name="encoder")
        self.decoder = Decoder(c, name="decoder")
        self.quant_conv = _conv(2 * c.embed_dim, 1, 1, 0, name="quant_conv",
                                dtype=dtype)
        self.post_quant_conv = _conv(c.z_channels, 1, 1, 0,
                                     name="post_quant_conv", dtype=dtype)

    def encode(self, x: jax.Array) -> jax.Array:
        """``[B, H, W, 3]`` in [-1, 1] → moments ``[B, H/8, W/8, 2*embed]``."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        moments = self.encode(x)
        post = DiagonalGaussian.from_moments(moments)
        z = post.sample(key) if key is not None else post.mode()
        return self.decode(z), post
