"""Binarization primitives: Binary-Concrete and binary Gumbel-Softmax.

TPU-native re-design of the reference's four near-identical copies of
``binary_concrete_logits`` (reference
``models/contrastive_RBVAE/contrastive_RBVAE_model.py:16-43``,
``simple_RBVAE_model.py:17-44``, ``percep_RBVAE_model.py:17-44``,
``triplet_RBVAE_model.py:18-45``) and ``gumbel_softmax_logits`` /
``sample_gumbel`` (``simple_RBVAE_model.py:46-72``).

Differences from the reference, by design:
  * Explicit PRNG keys instead of global torch RNG state.
  * ``noise_scale=0`` gives a fully deterministic path (the reference always
    samples noise, even at eval — SURVEY.md §7 "stochasticity parity").
  * Straight-through estimator via ``stop_gradient`` instead of ``.detach()``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logistic_noise(key: jax.Array, shape, eps: float,
                   dtype=jnp.float32) -> jax.Array:
    """``log(U + eps) - log(1 - U + eps)`` with ``U ~ Uniform[0, 1)``.

    Matches the reference's noise construction exactly given the same U
    (``contrastive_RBVAE_model.py:32-34``).
    """
    u = jax.random.uniform(key, shape, dtype=dtype)
    return jnp.log(u + eps) - jnp.log(1.0 - u + eps)


def binary_concrete(logits: jax.Array,
                    key: jax.Array | None,
                    temperature: float | jax.Array = 0.5,
                    hard: bool = False,
                    eps: float = 1e-8,
                    noise_scale: float | jax.Array = 1.0) -> jax.Array:
    """Binary-Concrete (logistic-noise reparameterized Bernoulli) relaxation.

    ``y = sigmoid((logits + noise_scale * logistic) / temperature)``; if
    ``hard``, straight-through-discretized at 0.5.

    Args:
      logits: one logit per latent variable, any shape.
      key: PRNG key, or ``None`` / ``noise_scale==0`` for no noise.
      temperature: relaxation temperature (static or traced scalar).
      hard: straight-through discretization (forward is 0/1, gradient flows
        through the soft sample).
      eps: numerical floor inside the logs (1e-8; simple variant uses 1e-10).
      noise_scale: multiplier on the logistic noise. The reference's
        contrastive/percep variants call this ``noise_ratio``; simple/triplet
        fix it to 1.
    """
    if key is not None:
        noise = logistic_noise(key, logits.shape, eps, logits.dtype)
        logits = logits + jnp.asarray(noise_scale, logits.dtype) * noise
    y = jax.nn.sigmoid(logits / jnp.asarray(temperature, logits.dtype))
    if hard:
        y_hard = (y > 0.5).astype(y.dtype)
        y = y + jax.lax.stop_gradient(y_hard - y)
    return y


def gumbel_softmax_binary(logits2: jax.Array,
                          key: jax.Array | None,
                          temperature: float | jax.Array = 1.0,
                          hard: bool = False,
                          eps: float = 1e-10) -> jax.Array:
    """2-category Gumbel-Softmax (reference ``simple_RBVAE_model.py:46-72``).

    Args:
      logits2: ``[..., 2]`` two logits per latent variable.
    Returns:
      ``[..., 2]`` relaxed one-hot samples; take ``[..., 1]`` for p(z=1).
    """
    if key is not None:
        u = jax.random.uniform(key, logits2.shape, dtype=logits2.dtype)
        g = -jnp.log(-jnp.log(u + eps) + eps)
        logits2 = logits2 + g
    y = jax.nn.softmax(logits2 / jnp.asarray(temperature, logits2.dtype),
                       axis=-1)
    if hard:
        y_hard = (y == jnp.max(y, axis=-1, keepdims=True)).astype(y.dtype)
        y = y + jax.lax.stop_gradient(y_hard - y)
    return y
