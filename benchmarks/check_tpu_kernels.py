"""Real-hardware verification of the Pallas kernels (run on TPU).

CPU pytest covers the interpret-mode / deterministic subsets; this script
checks the paths that need actual TPU lowering:
  * flash attention vs the blocked XLA reference at the mid-block shape
  * the fused binary-concrete sampler's noisy path (on-chip PRNG):
    marginal statistics, seed determinism, logit monotonicity
Prints one JSON line per check; exits nonzero on failure.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/svtpu_jax_cache")


def check(name, ok, **info):
    print(json.dumps({"check": name, "ok": bool(ok), **info}))
    return bool(ok)


def main():
    assert jax.default_backend() not in ("cpu",), "run on TPU"
    results = []

    # --- fused binary concrete, noisy path (cheap compiles, run first)
    from svtpu.ops.binarize_pallas import binary_concrete_pallas

    f = jax.jit(lambda l, s: binary_concrete_pallas(l, s, 0.5, 1.0, True))
    zeros = jnp.zeros((256, 128), jnp.float32)
    y = np.asarray(f(zeros, 3))
    p = float(y.mean())
    results.append(check("bc_pallas_marginal", 0.45 < p < 0.55, p_one=p))

    y2 = np.asarray(f(zeros, 3))
    results.append(check("bc_pallas_seed_determinism",
                         np.array_equal(y, y2)))
    y3 = np.asarray(f(zeros, 4))
    results.append(check("bc_pallas_seed_variation",
                         not np.array_equal(y, y3)))

    # Strongly positive logits → nearly all ones.
    big = jnp.full((256, 128), 8.0, jnp.float32)
    yb = np.asarray(f(big, 5))
    results.append(check("bc_pallas_monotonic", yb.mean() > 0.95,
                         p_one=float(yb.mean())))

    # --- flash attention exactness (full mid-block shape for the kernel,
    # a 2048-token slice for the XLA reference to keep compiles short)
    from svtpu.ops.attention import blocked_attention, flash_attention

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 2048, 512)), jnp.float32)
               for _ in range(3))
    got = np.asarray(jax.jit(flash_attention)(q, k, v))
    ref = np.asarray(jax.jit(blocked_attention)(q, k, v))
    err = float(np.max(np.abs(got - ref)))
    results.append(check("flash_attention_exactness", err < 1e-3,
                         max_abs_err=err))

    if not all(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
