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

    # --- encode-path parity: pallas_sampler flag vs the XLA op. In
    # deterministic mode both reduce to sigmoid(h/temp) > 0.5, so the hard
    # codes must match bit-for-bit.
    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE

    x = jnp.asarray(np.random.default_rng(1).random((16, 1, 64, 64, 3),
                                                    dtype=np.float32))
    codes = {}
    for name, flag in (("xla", False), ("pallas", True)):
        cfg = rbvae_variant("contrastive", latent_dim=50, input_hw=(64, 64),
                            compute_dtype="bfloat16", pallas_sampler=flag)
        model = Seq2SeqBinaryVAE(cfg)
        params = model.init({"params": jax.random.key(0)},
                            x[:1], 1.0, False, deterministic=True)
        codes[name] = np.asarray(jax.jit(
            lambda p, xx: model.apply(p, xx, 0.2, True,
                                      method=Seq2SeqBinaryVAE.encode,
                                      deterministic=True))(params, x))
    results.append(check("encode_pallas_flag_bitmatch",
                         np.array_equal(codes["xla"], codes["pallas"])))

    # --- flash attention exactness at BOTH a small shape and the full
    # production mid-block shape (14,080 tokens — different Pallas block
    # selection than 2,048; VERDICT r1 item 8), vs the chunked XLA
    # reference.
    from svtpu.ops.attention import blocked_attention, flash_attention

    rng = np.random.default_rng(0)
    for N in (2048, 14080):
        q, k, v = (jnp.asarray(rng.normal(size=(1, N, 512)), jnp.float32)
                   for _ in range(3))
        got = np.asarray(jax.jit(flash_attention)(q, k, v))
        ref = np.asarray(jax.jit(blocked_attention)(q, k, v))
        err = float(np.max(np.abs(got - ref)))
        results.append(check(f"flash_attention_exactness_{N}", err < 1e-3,
                             max_abs_err=err))

    # --- fused conv trunk exactness vs the XLA conv path (f32, then the
    # production bf16 encode with the pallas_trunk flag).
    from svtpu.ops.conv import Conv2dTorch
    from svtpu.ops.conv_trunk_pallas import fused_conv01

    xin = jnp.asarray(rng.normal(size=(8, 256, 256, 3)), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(3, 3, 3, 64)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.float32)
    b0, b1 = (jnp.asarray(rng.normal(size=(64,)), jnp.float32)
              for _ in range(2))
    conv = Conv2dTorch(64, 3, 2, 1)

    def xla_trunk(xx, wa, ba, wb, bb):
        h = conv.apply({"params": {"kernel": wa, "bias": ba}}, xx)
        h = conv.apply({"params": {"kernel": wb, "bias": bb}},
                       jax.nn.relu(h))
        return jax.nn.relu(h)

    got = np.asarray(jax.jit(fused_conv01)(xin, w0, b0, w1, b1))
    ref = np.asarray(jax.jit(xla_trunk)(xin, w0, b0, w1, b1))
    err = float(np.max(np.abs(got - ref)))
    results.append(check("fused_conv01_exactness_f32", err < 1e-3,
                         max_abs_err=err))
    try:
        got4 = np.asarray(fused_conv01(xin, w0, b0, w1, b1, block_n=4))
        err4 = float(np.max(np.abs(got4 - ref)))
        results.append(check("fused_conv01_block4_exactness_f32",
                             err4 < 1e-3, max_abs_err=err4))
    except Exception as e:   # e.g. VMEM overflow — don't abort the suite
        results.append(check("fused_conv01_block4_exactness_f32", False,
                             error=str(e)[:160]))

    codes = {}
    for name, flag in (("xla", False), ("pallas", True)):
        cfg = rbvae_variant("contrastive", latent_dim=50,
                            compute_dtype="bfloat16", pallas_trunk=flag)
        model = Seq2SeqBinaryVAE(cfg)
        x256 = jnp.asarray(np.random.default_rng(2).random(
            (4, 1, 256, 256, 3), dtype=np.float32))
        params = model.init({"params": jax.random.key(0)},
                            x256[:1], 1.0, False, deterministic=True)
        codes[name] = np.asarray(jax.jit(
            lambda p, xx, model=model: model.apply(
                p, xx, 0.2, True, method=Seq2SeqBinaryVAE.encode,
                deterministic=True))(params, x256))
    mismatch = float((codes["xla"] != codes["pallas"]).mean())
    results.append(check("encode_pallas_trunk_bitmatch", mismatch < 0.02,
                         bit_mismatch_frac=mismatch))

    if not all(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
