"""2-D conv / transposed-conv with torch geometry, NHWC layout.

The reference's conv trunks use ``nn.Conv2d(k, s, p)`` and
``nn.ConvTranspose2d(k, s, p, output_padding)`` in NCHW
(``contrastive_RBVAE_model.py:45-90``, ``simple_RBVAE_model.py:77-119``).
Here everything is NHWC — the layout XLA tiles best onto the TPU MXU — with
kernels stored HWIO. Transposed conv is expressed as an input-dilated forward
conv (its mathematical definition), which XLA lowers to a single MXU-friendly
convolution rather than a scatter.

Weight porting from torch:
  * Conv2d ``[O, I, kh, kw]``          → transpose to ``[kh, kw, I, O]``.
  * ConvTranspose2d ``[I, O, kh, kw]`` → spatial flip then ``[kh, kw, I, O]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_DN = ("NHWC", "HWIO", "NHWC")


def torch_uniform(fan_in: int):
    """torch's default kaiming-uniform(a=√5) ≡ U(-1/√fan_in, 1/√fan_in)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2dTorch(nn.Module):
    """Strided conv, geometry-identical to ``nn.Conv2d(k, s, p)``."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k, s, p = self.kernel, self.stride, self.padding
        init = torch_uniform(in_ch * k * k)
        w = self.param("kernel", init, (k, k, in_ch, self.features),
                       jnp.float32)
        b = self.param("bias", init, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (s, s),
            ((p, p), (p, p)), dimension_numbers=_DN,
            preferred_element_type=self.dtype)
        return y + b.astype(self.dtype)


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv, geometry-identical to
    ``nn.ConvTranspose2d(k, s, p, output_padding)``.

    Implemented as a forward conv over an input dilated by ``s`` with
    asymmetric padding ``(k-1-p, k-1-p+output_padding)``. The kernel param is
    stored in the equivalent-conv layout (already spatially flipped relative
    to torch's ConvTranspose weight).
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        # torch fan_in for ConvTranspose2d weight [I, O, k, k] is O*k*k.
        init = torch_uniform(self.features * k * k)
        w = self.param("kernel", init, (k, k, in_ch, self.features),
                       jnp.float32)
        b = self.param("bias", init, (self.features,), jnp.float32)
        lo = k - 1 - p
        hi = k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            ((lo, hi), (lo, hi)), lhs_dilation=(s, s), dimension_numbers=_DN,
            preferred_element_type=self.dtype)
        return y + b.astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with torch default init, fp32 params."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        init = torch_uniform(in_dim)
        w = self.param("kernel", init, (in_dim, self.features), jnp.float32)
        b = self.param("bias", init, (self.features,), jnp.float32)
        return x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)
