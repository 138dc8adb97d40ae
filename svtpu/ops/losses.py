"""Loss library — single home for math the reference duplicates per trainer.

Reference sources (SURVEY.md §2.3):
  * reconstruction MSE        — ``contrastive_RBVAE_train.py:32-33``
  * Bernoulli/Binary-Concrete KL — ``contrastive_RBVAE_train.py:52-76``
  * contrastive pairwise      — ``contrastive_RBVAE_train.py:79-107``
  * triplet margin (swap)     — ``triplet_RBVAE_train.py:82-96``
  * Jensen–Shannon triplet    — ``triplet_RBVAE_train.py:44-80, 99-119``
    (the reference's ``js_loss`` helper references an undefined ``m_log`` and
    would NameError if called — fixed here, not ported)
  * L1 sparsity               — ``contrastive_RBVAE_train.py:28-30``

All functions are pure and jit-safe; reductions match torch semantics so
golden tests can compare against torch CPU directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def recon_mse(x_recon: jax.Array, x: jax.Array) -> jax.Array:
    """Mean squared error over all elements (``F.mse_loss`` default)."""
    d = x_recon - x
    return jnp.mean(d * d)


def l1_sparsity(q_logits: jax.Array, lamb: float) -> jax.Array:
    """``lamb * ||logits||_1`` (sum of absolute values, torch ``norm(p=1)``)."""
    return lamb * jnp.sum(jnp.abs(q_logits))


def kl_binary_concrete(q: jax.Array, p: float = 0.5,
                       eps: float = 1e-8) -> jax.Array:
    """KL(Bernoulli(sigmoid(q)) || Bernoulli(p)), summed over the last dim,
    meaned over the rest.

    Note the reference trainers pass the *post-binarization* relaxed sample
    ``z_seq`` here, not raw logits (``contrastive_RBVAE_train.py:500``), so the
    sigmoid is applied on top of values already in (0,1). That behavior is
    preserved — callers decide what to feed.
    """
    q = jnp.clip(jax.nn.sigmoid(q), eps, 1.0 - eps)
    log_p = float(np.log(p))
    log_1mp = float(np.log1p(-p))
    kl = (q * (jnp.log(q + eps) - log_p)
          + (1.0 - q) * (jnp.log((1.0 - q) + eps) - log_1mp))
    return jnp.mean(jnp.sum(kl, axis=-1))


def pairwise_distance(x1: jax.Array, x2: jax.Array, p: float = 2.0,
                      eps: float = 1e-6) -> jax.Array:
    """torch ``F.pairwise_distance``: ``||x1 - x2 + eps||_p`` over last dim."""
    d = x1 - x2 + eps
    if p == 2.0:
        return jnp.sqrt(jnp.sum(d * d, axis=-1))
    return jnp.sum(jnp.abs(d) ** p, axis=-1) ** (1.0 / p)


def cosine_distance(x1: jax.Array, x2: jax.Array,
                    eps: float = 1e-8) -> jax.Array:
    """``1 - cos_sim`` over the last dim."""
    num = jnp.sum(x1 * x2, axis=-1)
    den = jnp.maximum(
        jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1), eps)
    return 1.0 - num / den


def contrastive(x1: jax.Array, x2: jax.Array, label: float,
                margin: float = 1.0, dist: str = "euclidean") -> jax.Array:
    """Pairwise contrastive loss (``contrastive_RBVAE_train.py:79-107``).

    ``label`` 0 = similar (minimize distance), 1 = dissimilar (push beyond
    ``margin``). Distances are computed over the last dim; the mean is over
    everything else.
    """
    if dist == "euclidean":
        d = pairwise_distance(x1, x2)
    elif dist == "cosine":
        d = cosine_distance(x1, x2)
    else:
        raise ValueError(f"unknown dist {dist!r}")
    similar = (1.0 - label) * d * d
    dissim = label * jnp.square(jnp.clip(margin - d, 0.0, None))
    return jnp.mean(similar + dissim)


def triplet_margin(anchor: jax.Array, positive: jax.Array,
                   negative: jax.Array, margin: float = 1.0, p: float = 2.0,
                   eps: float = 1e-8, swap: bool = True) -> jax.Array:
    """torch ``F.triplet_margin_loss`` semantics, mean reduction.

    With ``swap``, the negative distance is
    ``min(d(a, n), d(p, n))`` (distance swap from Balntas et al.).
    """
    d_ap = pairwise_distance(anchor, positive, p=p, eps=eps)
    d_an = pairwise_distance(anchor, negative, p=p, eps=eps)
    if swap:
        d_pn = pairwise_distance(positive, negative, p=p, eps=eps)
        d_an = jnp.minimum(d_an, d_pn)
    return jnp.mean(jax.nn.relu(d_ap - d_an + margin))


def js_distance_bernoulli(p: jax.Array, q: jax.Array,
                          eps: float = 1e-8) -> jax.Array:
    """Jensen–Shannon *distance* between per-dim Bernoullis.

    ``p, q``: ``[batch, latent]`` probabilities of "on". Follows the
    reference's reduction order (``triplet_RBVAE_train.py:44-80``): per-dim
    2-category JS divergence, mean over the category axis, mean over batch,
    then sqrt — yielding a ``[latent]`` vector of distances.
    """
    # Compute in f32 and clip the stacked 2-category probs: under bf16
    # compute the relaxed z saturates to exactly 1.0 (1 - 1e-8 is not
    # representable), so clipping p alone leaves 1-p == 0 and the KL term
    # for the off category becomes 0 * log(0) = NaN (observed: triplet js
    # run NaN from epoch 0, results/eval_triplet_js round 3).
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    p2 = jnp.clip(jnp.stack([p, 1.0 - p], axis=-1), eps, 1.0)
    q2 = jnp.clip(jnp.stack([q, 1.0 - q], axis=-1), eps, 1.0)
    m2 = 0.5 * (p2 + q2)
    # Elementwise KL terms target*(log target - log m) (torch kl_div with
    # log_target inputs, reduction='none').
    kl_pm = p2 * (jnp.log(p2) - jnp.log(m2))
    kl_qm = q2 * (jnp.log(q2) - jnp.log(m2))
    js = 0.5 * (kl_pm + kl_qm)          # [B, L, 2]
    js = jnp.mean(js, axis=-1)          # [B, L]
    js = jnp.mean(js, axis=0)           # [L]
    return jnp.sqrt(js + 1e-12)


def triplet_js(anchor: jax.Array, positive: jax.Array, negative: jax.Array,
               margin: float = 1.0, eps: float = 1e-8,
               swap: bool = False) -> jax.Array:
    """Triplet loss under the Bernoulli JS distance
    (``triplet_RBVAE_train.py:99-119``).

    Note: faithfully to the reference, the margin hinge uses ``d(a, n)``
    even when ``swap`` computed a smaller ``d_neg`` (the swap result is
    discarded by the reference's ``loss`` line; preserved for parity).
    """
    d_ap = js_distance_bernoulli(anchor, positive, eps)
    d_an = js_distance_bernoulli(anchor, negative, eps)
    return jnp.mean(jax.nn.relu(d_ap - d_an + margin))


def kl_binary_gumbel(logits2: jax.Array, p: float = 0.5,
                     eps: float = 1e-10) -> jax.Array:
    """KL for the 2-logit Gumbel-Softmax parameterization
    (``simple_RBVAE_train.py:32-43``): KL(softmax(logits) || [1-p, p]),
    summed over categories and latent dims, meaned over batch."""
    q = jax.nn.softmax(logits2, axis=-1)
    prior = jnp.asarray([1.0 - p, p], dtype=q.dtype)
    kl = q * (jnp.log(q + eps) - jnp.log(prior + eps))
    return jnp.mean(jnp.sum(kl, axis=(-1, -2)))
