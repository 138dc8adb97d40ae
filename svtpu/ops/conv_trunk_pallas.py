"""Fused Pallas kernel for the contrastive encoder's conv1→conv2 trunk.

Measured on v5e (`bench_suite.py breakdown`), conv1 (64→64, k3/s2) is 83%
of the headline encode path yet runs at 16% of bf16 peak — a third of its
own 45% MXU tiling ceiling — because XLA's lowering round-trips the
1 GB/batch of intermediate activations through HBM and tiles the stride-2
conv poorly. This kernel processes one image per grid step entirely in
VMEM: ReLU → im2col (stride-2 taps gathered into a ``[4096, 576]``
panel) → one MXU matmul per conv → ReLU → conv2 the same way. HBM traffic
per image drops to the 2 MB conv0 output read + 128 KB result write.

Scope: inference encode only (no VJP; training keeps the XLA path, which
autodiff needs anyway), and only the contrastive/triplet pixel geometry
(256×256 input → conv0 [128,128,64] → [32,32,64]). The generic path and
numerical reference is ``ops/conv.py::Conv2dTorch``; parity is pinned in
``tests/test_conv_trunk_pallas.py`` and on hardware by
``benchmarks/check_tpu_kernels.py``.

Reference provenance: the trunk itself is the reference's ConvEncoder
stack (``contrastive_RBVAE_model.py:45-67``) — two inner 64-channel
stride-2 convs with ReLU between.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phases(xp: jax.Array):
    """2×2 polyphase decomposition of a padded feature map.

    Mosaic does not lower stride-2 vector slices, so the stride-2 taps are
    instead taken from the four parity planes ``P[py][px][i, j, :] =
    xp[2i+py, 2j+px, :]``, built with reshapes + static indexing (plain
    even/odd deinterleaves).
    """
    P, Q, C = xp.shape
    rows = xp.reshape(P // 2, 2, Q, C)
    out = []
    for py in range(2):
        r = rows[:, py]                          # [P/2, Q, C]
        cols = r.reshape(P // 2, Q // 2, 2, C)
        out.append([cols[:, :, px] for px in range(2)])
    return out                                   # out[py][px]: [P/2, Q/2, C]


def _fill_taps(panel_ref, ph, out_hw: int, row0: int, rows: int,
               in_ch: int) -> None:
    """Fill an im2col panel ref for a stride-2 k3 conv from polyphase
    planes.

    Output row ``i``, col ``j`` read ``xp[2i+dy, 2j+dx]`` =
    ``ph[dy%2][dx%2][i + dy//2, j + dx//2]``; the row range
    ``[row0, row0+rows)`` is written into ``panel_ref``
    (``[rows*out_hw, 9*C]``) with taps ordered (dy, dx) row-major —
    matching ``w.reshape(9*C, O)`` of an HWIO kernel. Taps are stored
    one by one (Mosaic cannot concatenate operands with mismatched
    slice offsets).
    """
    for t, (dy, dx) in enumerate((a, b) for a in range(3) for b in range(3)):
        tap = jax.lax.slice(
            ph[dy % 2][dx % 2],
            (row0 + dy // 2, dx // 2, 0),
            (row0 + dy // 2 + rows, dx // 2 + out_hw, in_ch))
        panel_ref[:, t * in_ch:(t + 1) * in_ch] = tap.reshape(
            rows * out_hw, in_ch)


def _trunk_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, a1_ref,
                  h1_ref, a2_ref, *, halves: int):
    """One image: ReLU → conv1 (stride-2, in VMEM) → ReLU → conv2."""
    x = jnp.maximum(x_ref[0], 0)                            # [128,128,64]
    # Pad 1 for the k3 halo, plus enough to keep the taps in range.
    xp = jnp.pad(x, ((1, 3), (1, 3), (0, 0)))               # [132,132,64]
    ph = _phases(xp)                                        # 4× [66,66,64]

    rows = 64 // halves
    for r in range(halves):
        _fill_taps(a1_ref, ph, 64, r * rows, rows, 64)
        h = jax.lax.dot_general(
            a1_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[:]
        h1_ref[pl.ds(r * rows, rows)] = (
            jnp.maximum(h, 0).astype(h1_ref.dtype).reshape(rows, 64, 64))

    hp = jnp.pad(h1_ref[:], ((1, 3), (1, 3), (0, 0)))       # [68,68,64]
    _fill_taps(a2_ref, _phases(hp), 32, 0, 32, 64)          # [1024, 576]
    y = jax.lax.dot_general(
        a2_ref[:], w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[0] = y.astype(o_ref.dtype).reshape(32, 32, 64)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_trunk23(h0: jax.Array, w1: jax.Array, b1: jax.Array,
                  w2: jax.Array, b2: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """ReLU → conv1(k3,s2,p1) → ReLU → conv2(k3,s2,p1) fused in VMEM.

    Args:
      h0: conv0 output *including its bias*, ``[B, 128, 128, 64]``.
      w1/w2: HWIO kernels ``[3, 3, 64, 64]`` (``Conv2dTorch`` layout).
      b1/b2: biases ``[64]``.

    Returns ``[B, 32, 32, 64]`` in ``h0``'s dtype (conv2 output + bias,
    pre-ReLU-free exactly like the XLA trunk: no activation after the
    last conv).
    """
    B = h0.shape[0]
    assert h0.shape[1:] == (128, 128, 64), h0.shape
    dt = h0.dtype
    w1f = w1.reshape(576, 64).astype(dt)
    w2f = w2.reshape(576, 64).astype(dt)
    b1f = b1.reshape(1, 64).astype(jnp.float32)
    b2f = b2.reshape(1, 64).astype(jnp.float32)

    halves = 2
    kernel = functools.partial(_trunk_kernel, halves=halves)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 128, 128, 64), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, 32, 64), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 32, 32, 64), dt),
        scratch_shapes=[
            pltpu.VMEM((64 // halves * 64, 576), dt),   # conv1 im2col panel
            pltpu.VMEM((64, 64, 64), dt),               # conv1 output
            pltpu.VMEM((1024, 576), dt),                # conv2 im2col panel
        ],
        interpret=interpret,
    )(h0, w1f, b1f, w2f, b2f)
