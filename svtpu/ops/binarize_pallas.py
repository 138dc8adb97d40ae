"""Fused Binary-Concrete sampling as a Pallas TPU kernel.

The XLA path (``svtpu.ops.binarize``) emits a separate RNG kernel plus an
elementwise chain; this kernel fuses uniform-bit generation (on-chip PRNG),
logistic-noise construction, temperature sigmoid, and straight-through
thresholding into one VMEM-resident pass over a row-blocked grid.

Available on the inference encode path via ``RBVAEConfig.pallas_sampler``
but OFF by default: the measured A/B (``bench_suite.py sampler_ab``, v5e)
has the XLA op ahead (1.02x on the full encode path, 1.42x on the op in
isolation at [2^20, 64]) — XLA's fused threefry + elementwise chain wins
for this memory-bound op. Training always uses the XLA op (it needs the
soft VJP and jax.random key semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, temp_ref, scale_ref, logits_ref, out_ref,
            *, hard: bool, eps: float, noisy: bool):
    x = logits_ref[:].astype(jnp.float32)
    if noisy:
        # Decorrelate grid blocks: each program seeds its own stream.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
        # uint32 → uniform [0, 1): keep the 24 high bits (exact in f32).
        # Mosaic has no uint32→f32 cast; the top-8-bits-clear value is
        # non-negative, so bitcast to int32 and cast from there.
        u24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
        u = u24.astype(jnp.float32) * (1.0 / (1 << 24))
        noise = jnp.log(u + eps) - jnp.log(1.0 - u + eps)
        x = x + scale_ref[0] * noise
    y = jax.nn.sigmoid(x / temp_ref[0])
    if hard:
        y = (y > 0.5).astype(out_ref.dtype)
    out_ref[:] = y.astype(out_ref.dtype)


def binary_concrete_pallas(logits: jax.Array, seed,
                           temperature=0.5, noise_scale=1.0,
                           hard: bool = True, eps: float = 1e-8,
                           noisy: bool = True,
                           interpret: bool = False) -> jax.Array:
    """Sample Binary-Concrete values for ``[..., L]`` logits in one kernel.

    ``seed``: int32 scalar (derive from a key via
    ``jax.random.randint(key, (), 0, 2**31 - 1)`` for reproducibility).
    No VJP — inference only.
    """
    shape = logits.shape
    flat = logits.reshape(-1, shape[-1])
    n, L = flat.shape
    kernel = functools.partial(_kernel, hard=hard, eps=eps, noisy=noisy)
    # Grid over rows so arbitrarily large batches never exceed one VMEM
    # block. Budget ~2 MB per buffer counting lane padding (last dim pads
    # to 128); in+out double-buffered ≈ 8 MB, under the 16 MB scoped limit.
    padded_l = -(-L // 128) * 128
    block_rows = min(n, max(8, (2 << 20) // (4 * padded_l)))
    grid = -(-n // block_rows)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, logits.dtype),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32),
      jnp.asarray([temperature], jnp.float32),
      jnp.asarray([noise_scale], jnp.float32),
      flat)
    return out.reshape(shape)
