"""Golden-value parity tests for svtpu.ops against torch CPU.

The reference has no tests (SURVEY.md §4); these pin our math to the exact
torch semantics the reference relies on.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from svtpu.ops import losses
from svtpu.ops.binarize import binary_concrete

RTOL = 1e-5
ATOL = 1e-5


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_binary_concrete_matches_reference_given_same_noise():
    """Same uniform sample U → identical output to the reference formula."""
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 16)).astype(np.float32)
    u = rng.uniform(size=(4, 16)).astype(np.float32)
    eps, temp, ratio = 1e-8, 0.5, 0.3

    # Reference math (contrastive_RBVAE_model.py:32-43), recomputed in torch.
    noise = ratio * (np.log(u + eps) - np.log(1.0 - u + eps))
    expected = torch.sigmoid(t((logits + noise) / temp)).numpy()

    # Our op with injected noise (bypass RNG: add noise manually, scale=0).
    got = binary_concrete(jnp.asarray(logits + noise), None, temp, False, eps)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=RTOL, atol=ATOL)

    # Hard straight-through forward value.
    got_h = binary_concrete(jnp.asarray(logits + noise), None, temp, True, eps)
    np.testing.assert_array_equal(np.asarray(got_h), (expected > 0.5))


def test_binary_concrete_straight_through_gradient():
    logits = jnp.asarray([[0.3, -0.7, 2.0]])

    def f(l):
        return jnp.sum(binary_concrete(l, None, 0.5, True) ** 2)

    g_hard = jax.grad(f)(logits)
    # Straight-through: d(y_hard)/dlogits follows the soft path, and since
    # forward value is y_hard, grad = 2*y_hard * dsoft/dlogits.
    y_soft = jax.nn.sigmoid(logits / 0.5)
    y_hard = (y_soft > 0.5).astype(jnp.float32)
    expect = 2 * y_hard * y_soft * (1 - y_soft) / 0.5
    np.testing.assert_allclose(np.asarray(g_hard), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_kl_binary_concrete_matches_torch():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 5, 25)).astype(np.float32)
    p, eps = 0.1, 1e-8
    qt = torch.sigmoid(t(q)).clamp(eps, 1 - eps)
    kl = qt * (torch.log(qt + eps) - np.log(p)) + \
        (1 - qt) * (torch.log(1 - qt + eps) - np.log(1 - p))
    expected = kl.sum(dim=-1).mean().item()
    got = float(losses.kl_binary_concrete(jnp.asarray(q), p, eps))
    assert abs(got - expected) < 1e-4


def test_contrastive_matches_torch():
    rng = np.random.default_rng(2)
    x1 = rng.normal(size=(6, 7, 25)).astype(np.float32)
    x2 = rng.normal(size=(6, 7, 25)).astype(np.float32)
    for label in (0.0, 1.0):
        d = F.pairwise_distance(t(x1), t(x2))
        expected = ((1 - label) * d.pow(2)
                    + label * torch.clamp(0.8 - d, min=0).pow(2)).mean().item()
        got = float(losses.contrastive(jnp.asarray(x1), jnp.asarray(x2),
                                       label, margin=0.8))
        assert abs(got - expected) < 1e-4, label


def test_triplet_margin_matches_torch():
    rng = np.random.default_rng(3)
    a, p_, n = (rng.normal(size=(16, 25)).astype(np.float32) for _ in range(3))
    expected = F.triplet_margin_loss(t(a), t(p_), t(n), margin=0.4,
                                     swap=True).item()
    got = float(losses.triplet_margin(jnp.asarray(a), jnp.asarray(p_),
                                      jnp.asarray(n), margin=0.4, swap=True))
    assert abs(got - expected) < 1e-4


def test_js_distance_matches_reference_formula():
    rng = np.random.default_rng(4)
    p = rng.uniform(0.01, 0.99, size=(8, 25)).astype(np.float32)
    q = rng.uniform(0.01, 0.99, size=(8, 25)).astype(np.float32)
    eps = 1e-8
    # Reference math (triplet_RBVAE_train.py:44-80) in torch.
    pt, qt = t(p).clamp(eps, 1 - eps), t(q).clamp(eps, 1 - eps)
    p2 = torch.stack([pt, 1 - pt], dim=-1)
    q2 = torch.stack([qt, 1 - qt], dim=-1)
    m2 = 0.5 * (p2 + q2)
    kl_pm = F.kl_div(m2.log(), p2.log(), log_target=True, reduction="none")
    kl_qm = F.kl_div(m2.log(), q2.log(), log_target=True, reduction="none")
    js = (0.5 * (kl_pm + kl_qm)).mean(dim=-1).mean(dim=0)
    expected = torch.sqrt(js + 1e-12).numpy()
    got = np.asarray(losses.js_distance_bernoulli(jnp.asarray(p),
                                                  jnp.asarray(q), eps))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_recon_and_l1():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(3, 4, 5)).astype(np.float32)
    b = rng.normal(size=(3, 4, 5)).astype(np.float32)
    assert abs(float(losses.recon_mse(jnp.asarray(a), jnp.asarray(b)))
               - F.mse_loss(t(a), t(b)).item()) < 1e-5
    assert abs(float(losses.l1_sparsity(jnp.asarray(a), 0.3))
               - (0.3 * t(a).norm(p=1)).item()) < 1e-3


def test_binary_concrete_pallas_interpret():
    """Pallas fused sampler (interpret mode): deterministic path matches the
    XLA op exactly; noisy path has the right marginal statistics."""
    from svtpu.ops.binarize_pallas import binary_concrete_pallas

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))

    det = binary_concrete_pallas(logits, seed=0, temperature=0.5,
                                 hard=False, noisy=False, interpret=True)
    expect = jax.nn.sigmoid(logits / 0.5)
    np.testing.assert_allclose(np.asarray(det), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)

    hard = binary_concrete_pallas(logits, seed=0, temperature=0.5,
                                  hard=True, noisy=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(hard),
                                  np.asarray(expect) > 0.5)
    # The noisy path uses the on-chip PRNG (pltpu.prng_seed), which has no
    # CPU interpret lowering — covered by benchmarks/check_tpu_kernels.py
    # on real hardware.


def test_js_triplet_finite_at_bf16_saturation():
    """Regression for the round-3 triplet-js NaN: relaxed z saturates to
    exactly 0/1 under bf16 compute, and clipping p alone leaves 1-p == 0
    (1 - 1e-8 is not representable in bf16) -> 0 * log(0) = NaN. The loss
    and its gradient must stay finite at saturated inputs."""
    a = jnp.asarray([[1.0, 0.0, 0.5]], dtype=jnp.bfloat16)
    p = jnp.asarray([[1.0, 0.0, 0.5]], dtype=jnp.bfloat16)
    n = jnp.asarray([[0.0, 1.0, 0.5]], dtype=jnp.bfloat16)
    val = losses.triplet_js(a, p, n, margin=1.0)
    assert np.isfinite(float(val))

    grads = jax.grad(
        lambda aa: losses.triplet_js(aa, p, n, margin=1.0))(a)
    assert np.all(np.isfinite(np.asarray(grads, dtype=np.float32)))
