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


def conv2d_torch_apply(x: jax.Array, w: jax.Array, b: jax.Array,
                       stride: int, padding: int, dtype,
                       s2d: bool = False) -> jax.Array:
    """Functional ``nn.Conv2d(k, s, p)``-geometry conv (NHWC, HWIO)."""
    k, s, p = w.shape[0], stride, padding
    xd, wd = x.astype(dtype), w.astype(dtype)
    if s2d and (k, s, p) == (3, 2, 1) and x.shape[1] % 2 == 0 \
            and x.shape[2] % 2 == 0:
        y = _conv_s2d_k3s2p1(xd, wd, dtype)
    else:
        y = jax.lax.conv_general_dilated(
            xd, wd, (s, s), ((p, p), (p, p)), dimension_numbers=_DN,
            preferred_element_type=dtype)
    return y + b.astype(dtype)


def conv2d_int8(x: jax.Array, w: jax.Array, b: jax.Array,
                stride: int, padding: int, dtype) -> jax.Array:
    """Dynamic symmetric int8-quantized conv (inference only).

    v5e's int8 MXU peak is 2x the bf16 peak, and the encode path's
    output is binary codes behind a hard threshold, so precision
    headroom exists. Per-output-channel kernel scales (HWIO axis 3),
    per-tensor activation scale, int32 accumulation, dequantize +
    bias in ``dtype``. Gradients do not flow through ``round`` — this
    path is for the encode/serving direction only.
    """
    kscale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-8)
    kq = jnp.clip(jnp.round(w / kscale), -127, 127).astype(jnp.int8)
    ascale = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0,
                         1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    return ((y.astype(jnp.float32) * (ascale * kscale)).astype(dtype)
            + b.astype(dtype))


class ConvParams(nn.Module):
    """Parameter holder with ``Conv2dTorch``'s exact tree and init —
    lets a caller route the same weights through alternative compute
    paths (e.g. the fused Pallas trunk) without changing checkpoints."""

    features: int
    in_channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel
        init = torch_uniform(self.in_channels * k * k)
        w = self.param("kernel", init,
                       (k, k, self.in_channels, self.features), jnp.float32)
        b = self.param("bias", init, (self.features,), jnp.float32)
        return w, b


class Conv2dTorch(nn.Module):
    """Strided conv, geometry-identical to ``nn.Conv2d(k, s, p)``.

    ``s2d=True`` (k3/s2/p1 only) computes the identical convolution via a
    2×2 space-to-depth transform: the k3 kernel is zero-padded to k4 and
    folded into a k2/s1 conv over 4×-deeper channels. Same parameters,
    same math — but the MXU contraction axis grows from ``9·C_in`` to
    ``16·C_in``. Measured on v5e (`bench_suite.py conv0_ab`): XLA's own
    internal conv0 transform is faster, so this stays opt-in.
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel
        init = torch_uniform(in_ch * k * k)
        w = self.param("kernel", init, (k, k, in_ch, self.features),
                       jnp.float32)
        b = self.param("bias", init, (self.features,), jnp.float32)
        return conv2d_torch_apply(x, w, b, self.stride, self.padding,
                                  self.dtype, self.s2d)


def _conv_s2d_k3s2p1(x: jax.Array, w: jax.Array, dtype) -> jax.Array:
    """k3/s2/p1 conv as a k2/s1 conv over 2×2 space-to-depth blocks.

    Output row ``o`` of the original conv reads padded rows ``2o..2o+2``
    (pad 1); zero-padding the kernel to k4 extends the read to
    ``2o..2o+3`` — exactly block rows ``o`` and ``o+1`` of the 2×2
    blocking of the padded input, so the conv becomes kernel-2 stride-1
    over the block grid with ``4·C_in`` channels.
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hb, wb = (H + 2) // 2, (W + 2) // 2
    xb = xp.reshape(B, hb, 2, wb, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, hb, wb, 4 * C)
    # w4[dy, dx] = w[dy, dx] for dy,dx<3, zero at 3; split (dy)->(by, iy).
    w4 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    O = w.shape[-1]
    w2 = (w4.reshape(2, 2, 2, 2, C, O)        # [by, iy, bx, ix, C, O]
          .transpose(0, 2, 1, 3, 4, 5)         # [by, bx, iy, ix, C, O]
          .reshape(2, 2, 4 * C, O))
    return jax.lax.conv_general_dilated(
        xb, w2, (1, 1), ((0, 0), (0, 0)), dimension_numbers=_DN,
        preferred_element_type=dtype)


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
    d2s: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        # torch fan_in for ConvTranspose2d weight [I, O, k, k] is O*k*k.
        init = torch_uniform(self.features * k * k)
        w = self.param("kernel", init, (k, k, in_ch, self.features),
                       jnp.float32)
        b = self.param("bias", init, (self.features,), jnp.float32)
        xd, wd = x.astype(self.dtype), w.astype(self.dtype)
        if self.d2s and (k, s, p, op) == (3, 2, 1, 1):
            y = _deconv_d2s_k3s2p1(xd, wd, self.dtype)
        else:
            lo = k - 1 - p
            hi = k - 1 - p + op
            y = jax.lax.conv_general_dilated(
                xd, wd, (1, 1), ((lo, hi), (lo, hi)), lhs_dilation=(s, s),
                dimension_numbers=_DN, preferred_element_type=self.dtype)
        return y + b.astype(self.dtype)


def _deconv_d2s_k3s2p1(x: jax.Array, w: jax.Array, dtype) -> jax.Array:
    """k3/s2/p1/op1 transposed conv as a k2/s1 conv + depth-to-space.

    The dilated-forward formulation computes ``y[m] = Σ_dy w[dy]·d[m+dy-1]``
    over the 2×-dilated input ``d`` (``d[2t] = x[t]``), so per axis the even
    output phase touches one real tap (``w[1]``) and the odd phase two
    (``w[0]``/``w[2]``): with ``D[a][phase] = 1-phase+2a`` (index 3 = the
    zero-padded row), every phase is a k2 sub-kernel over the *undilated*
    input. One k2/s1 conv to ``4·O`` channels + a 2×2 depth-to-space then
    produces the identical output with no dilated-zero arithmetic and a
    4×-wider MXU output-lane axis (the sub-pixel / "pixel-shuffle" trick).
    """
    B, H, W, C = x.shape
    O = w.shape[-1]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))       # [4,4,C,O]
    D = jnp.array([[1, 0], [3, 2]])                          # [ay, py] -> dy
    w2 = wp[D]                                               # [ay,py,4,C,O]
    w2 = w2[:, :, D]                                         # [ay,py,ax,px,C,O]
    w2 = (w2.transpose(0, 2, 4, 1, 3, 5)                     # [ay,ax,C,py,px,O]
          .reshape(2, 2, C, 4 * O))
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w2, (1, 1), ((0, 0), (0, 0)), dimension_numbers=_DN,
        preferred_element_type=dtype)                        # [B,H,W,4O]
    y = (y.reshape(B, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
         .reshape(B, 2 * H, 2 * W, O))
    return y


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
