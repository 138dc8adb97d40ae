"""Device-side image preprocessing and perturbation ops (all jit-safe).

The reference does preprocessing on CPU workers (PIL resize + ToTensor,
``contrastive_RBVAE_train.py:110-114``) and perturbations in torch
(``embedding_matching.py:141-193``). Here frames travel to the device as
uint8 and everything else — dtype conversion, scaling, resize, noise,
occlusion — is fused XLA work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_float01(x_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [0,255] → float [0,1] (torchvision ``ToTensor`` scaling)."""
    return x_u8.astype(dtype) * (1.0 / 255.0)


def to_pm1(x01: jax.Array) -> jax.Array:
    """[0,1] → [-1,1] (SD encoder input convention,
    ``get_percep_embeddings.py:71``)."""
    return 2.0 * x01 - 1.0


def resize_bilinear(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize over the two spatial dims of ``[..., H, W, C]``."""
    out_shape = x.shape[:-3] + (hw[0], hw[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear")


def add_gaussian_noise(x01: jax.Array, key: jax.Array,
                       std: float = 0.1, mean: float = 0.0) -> jax.Array:
    """Gaussian pixel noise, clipped to [0,1]
    (``embedding_matching.py:141-160``)."""
    noise = jax.random.normal(key, x01.shape, x01.dtype) * std + mean
    return jnp.clip(x01 + noise, 0.0, 1.0)


def add_occlusion(x01: jax.Array, key: jax.Array,
                  coverage: float = 0.2, value: float = 0.5) -> jax.Array:
    """Grey-square occlusion covering ``coverage`` of the image
    (``embedding_matching.py:164-193``), random position per call.

    ``x01``: ``[..., H, W, C]``; one square position shared across leading
    dims (matching the reference, which draws one square per call).
    """
    H, W = x01.shape[-3], x01.shape[-2]
    side = int((coverage * H * W) ** 0.5)
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, H - side + 1)
    x0 = jax.random.randint(kx, (), 0, W - side + 1)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    mask = ((rows >= y0) & (rows < y0 + side)
            & (cols >= x0) & (cols < x0 + side))
    return jnp.where(mask[..., None], jnp.asarray(value, x01.dtype), x01)
