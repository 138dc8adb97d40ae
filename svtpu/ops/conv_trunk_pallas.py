"""Pallas-accelerated conv trunk for the contrastive encoder.

Measured on v5e (`bench_suite.py breakdown`), conv1 (64→64, k3/s2) is 83%
of the headline encode path yet runs at 16% of bf16 peak — a third of its
own 45% MXU tiling ceiling. The bottleneck is XLA's stride-2 lowering,
not HBM bandwidth (276 GB/s effective).

Design (shaped by what Mosaic will lower — no stride-2 vector slices, no
lane-merge reshapes, no leading↔sublane transposes):

1. **conv0 runs in XLA as four stride-4 polyphase convolutions** — the
   four (row-parity × col-parity) planes of conv0's output are each a
   stride-4 conv of the raw input (same total FLOPs; XLA's thin-conv
   transform applies to each). Zero rows/cols for conv1's padding and a
   lane-axis concat assemble two *parity-major* maps in which the column
   parity lives on the lane dimension:
   ``MO[a, b, cp*64+ch] = q(2a-1, 2b-1+cp)``,
   ``ME[a, b, cp*64+ch] = q(2a, 2b-1+cp)``, where ``q`` indexes conv1's
   zero-padded input domain.
2. **conv1 runs in Pallas**, one image per grid step: for each kernel
   row ``dy``, the taps dx∈{0,1} land in one dense
   ``[4096, 128] @ [128, 64]`` MXU matmul (K-fill 100%) over a slice of
   the right parity map, and dx=2 in a second matmul of the same shape
   with the odd-parity half of the weights zeroed. ReLU of conv0 happens
   on the way in, ReLU of conv1 on the way out; every slice is
   leading-dim or sublane-offset (both verified supported).
3. conv2 (10% of the path) stays in XLA.

Inference-only (no VJP; training keeps the XLA path, which autodiff
needs anyway), contrastive/triplet pixel geometry only. The generic path
and numerical reference is ``ops/conv.py``; parity is pinned in
``tests/test_conv_trunk_pallas.py`` and on hardware by
``benchmarks/check_tpu_kernels.py``.

Reference provenance: the trunk is the reference ConvEncoder stack
(``contrastive_RBVAE_model.py:45-67``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN = ("NHWC", "HWIO", "NHWC")

# libtpu CRASHES (remote compile helper exit 1, diagnostic hidden by the
# relay) compiling the multi-image kernel past an empirical batch
# boundary — n=2: B<=104 ok, >=112 crash; n=4: B<=48 ok, >=64 crash —
# while the single-image kernel compiles at any B (probed 2026-08-17
# with a healthy service: fresh trivial kernels compiled in the same
# session). fused_conv01 chunks the batch with lax.map so every
# pallas_call stays under this boundary.
_COMPILE_SAFE_B = {2: 96, 4: 48}


def conv0_polyphase(x: jax.Array, w0: jax.Array, b0: jax.Array, dtype):
    """conv0 (k3/s2/p1) evaluated directly in polyphase form.

    Returns ``(ME, MO)`` parity-major maps of conv1's zero-padded input
    domain ``q ∈ [-1, 127]²`` (conv0 output padded by 1; q=-1 rows/cols
    are zeros):

      * ``MO``: odd rows ``q_r = 2a-1`` (a=0..64), ``[B, 65, 65, 128]``
      * ``ME``: even rows ``q_r = 2a`` (a=0..63), ``[B, 64, 65, 128]``

    with lanes ``cp*64+ch`` covering column ``q_c = 2b-1+cp``.
    """
    xd, wd = x.astype(dtype), w0.astype(dtype)
    B = x.shape[0]

    def p4(row_odd: bool, col_odd: bool):
        # Plane entry t: conv0 output row 2t+1 (odd planes, input slice
        # from 1) or 2t (even planes, pad lo 1); ditto columns.
        src = xd
        if row_odd:
            src = src[:, 1:]
        if col_odd:
            src = src[:, :, 1:]
        pad_r = (0, 0) if row_odd else (1, 0)
        pad_c = (0, 0) if col_odd else (1, 0)
        return jax.lax.conv_general_dilated(
            src, wd, (4, 4), (pad_r, pad_c), dimension_numbers=_DN,
            preferred_element_type=dtype)              # [B, 64, 64, 64]

    bias = b0.astype(dtype)
    oo, oe, eo, ee = (p4(True, True) + bias, p4(True, False) + bias,
                      p4(False, True) + bias, p4(False, False) + bias)
    zrow = jnp.zeros((B, 1, 64, 64), dtype)
    zcol = jnp.zeros((B, 65, 1, 64), dtype)
    # Odd-row map: q_r = 2a-1 → a=0 is the q=-1 zero row. Lanes: cp=0 is
    # the odd-column plane (q_c = 2b-1, b=0 zero col), cp=1 the even
    # (q_c = 2b; b=64 unused, zero-padded).
    oo_f = jnp.concatenate([zcol, jnp.concatenate([zrow, oo], 1)], 2)
    oe_f = jnp.concatenate([jnp.concatenate([zrow, oe], 1), zcol], 2)
    MO = jnp.concatenate([oo_f, oe_f], -1)             # [B, 65, 65, 128]
    zcol_e = jnp.zeros((B, 64, 1, 64), dtype)
    eo_f = jnp.concatenate([zcol_e, eo], 2)
    ee_f = jnp.concatenate([ee, zcol_e], 2)
    ME = jnp.concatenate([eo_f, ee_f], -1)             # [B, 64, 65, 128]
    return ME, MO


def _conv1_kernel(me_ref, mo_ref, wa_ref, wb_ref, b_ref, o_ref):
    """One image: ReLU(conv0 planes) → conv1 (stride-2) → ReLU."""
    xe = jnp.maximum(me_ref[0], 0)                     # [64, 65, 128]
    xo = jnp.maximum(mo_ref[0], 0)                     # [65, 65, 128]
    acc = None
    # Tap row q_r = 2i-1+dy: dy=0 → odd plane a=i; dy=1 → even plane
    # a=i; dy=2 → odd plane a=i+1.
    for dy, (plane, off) in enumerate(((xo, 0), (xe, 0), (xo, 1))):
        a_cur = plane[off:off + 64, 0:64].reshape(4096, 128)
        a_nxt = plane[off:off + 64, 1:65].reshape(4096, 128)
        part = (jnp.dot(a_cur, wa_ref[dy],
                        preferred_element_type=jnp.float32)
                + jnp.dot(a_nxt, wb_ref[dy],
                          preferred_element_type=jnp.float32))
        acc = part if acc is None else acc + part
    y = jnp.maximum(acc + b_ref[:], 0)
    o_ref[0] = y.astype(o_ref.dtype).reshape(64, 64, 64)


def _conv1_kernel_multi(n, me_ref, mo_ref, wa_ref, wb_ref, b_ref, o_ref):
    """``n`` images per grid step (VERDICT r2 item 6 follow-up).

    Round 2's standalone kernel was grid/copy-bound at one image per
    step; the obvious fix — one cross-image ``[n*4096, 128]`` reshape —
    is the exact shape cast Mosaic rejects. This variant amortizes the
    per-step overhead WITHOUT that reshape: a static Python loop over
    the ``n`` images of the block (per-image slices + matmuls, all the
    shapes the single-image kernel already lowers), and the six per-image
    ``[4096,128]@[128,64]`` matmuls fused into two ``[4096,384]@[384,64]``
    (lane-axis concat over the three kernel rows — adjacent-tile copies,
    no layout change), so the MXU sees fewer, deeper ops per step.
    """
    for i in range(n):
        xe = jnp.maximum(me_ref[i], 0)                 # [64, 65, 128]
        xo = jnp.maximum(mo_ref[i], 0)                 # [65, 65, 128]
        cur, nxt = [], []
        for plane, off in ((xo, 0), (xe, 0), (xo, 1)):
            cur.append(plane[off:off + 64, 0:64].reshape(4096, 128))
            nxt.append(plane[off:off + 64, 1:65].reshape(4096, 128))
        acc = (jnp.dot(jnp.concatenate(cur, 1), wa_ref[:],
                       preferred_element_type=jnp.float32)
               + jnp.dot(jnp.concatenate(nxt, 1), wb_ref[:],
                         preferred_element_type=jnp.float32))
        y = jnp.maximum(acc + b_ref[:], 0)
        o_ref[i] = y.astype(o_ref.dtype).reshape(64, 64, 64)


def _conv1_weights(w: jax.Array, dtype):
    """``[3,3,C,O]`` HWIO kernel → lane-major banks ``[3, 2C, O]``.

    Lane ``cp*C+ch`` holds column ``q_c = 2b-1+cp``; for output column
    ``j`` (taps ``q_c = 2j-1+dx``): block ``b=j`` carries dx=0 (cp0) and
    dx=1 (cp1) → bank *a*; block ``b=j+1`` carries dx=2 on cp0 → bank
    *b* (cp1 half zero)."""
    C, O = w.shape[2], w.shape[3]
    wd = w.astype(dtype)
    wa = jnp.concatenate([wd[:, 0], wd[:, 1]], axis=1)
    wb = jnp.concatenate([wd[:, 2], jnp.zeros((3, C, O), dtype)], axis=1)
    return wa, wb


@functools.partial(jax.jit, static_argnames=("interpret", "block_n"))
def fused_conv01(x: jax.Array, w0: jax.Array, b0: jax.Array,
                 w1: jax.Array, b1: jax.Array,
                 interpret: bool = False, block_n: int = 1) -> jax.Array:
    """conv0 (XLA, polyphase) → ReLU → conv1 (Pallas) → ReLU.

    Args:
      x: normalized frames ``[B, 256, 256, 3]`` (f32/bf16).
      w0/w1: HWIO kernels ``[3, 3, 3, 64]`` / ``[3, 3, 64, 64]``.
      b0/b1: biases ``[64]``.

    Returns post-ReLU conv1 activations ``[B, 64, 64, 64]`` in bf16 when
    the input is low precision (the trunk's compute dtype), matching
    ``relu(conv1(relu(conv0(x))))`` of the generic path.
    """
    B = x.shape[0]
    assert x.shape[1:3] == (256, 256), x.shape
    dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    ME, MO = conv0_polyphase(x, w0, b0, dt)
    wa, wb = _conv1_weights(w1, dt)
    b1f = b1.reshape(1, 64).astype(jnp.float32)
    n = block_n if block_n > 1 and B % block_n == 0 else 1
    if n > 1:
        # K-major banks for the fused per-image matmul: [3, 2C, O] →
        # [3*2C, O] (row-major over dy, matching the lane-axis concat of
        # the three dy slices inside the kernel).
        wa = wa.reshape(-1, wa.shape[-1])
        wb = wb.reshape(-1, wb.shape[-1])

        def call(me, mo):
            nb = me.shape[0]
            return pl.pallas_call(
                functools.partial(_conv1_kernel_multi, n),
                grid=(nb // n,),
                in_specs=[
                    pl.BlockSpec((n, 64, 65, 128), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, 65, 65, 128), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((n, 64, 64, 64),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, 64, 64, 64), dt),
                interpret=interpret,
            )(me, mo, wa, wb, b1f)

        limit = _COMPILE_SAFE_B.get(n, 48)
        if B > limit:
            chunk = next((c for c in range(limit, n - 1, -n)
                          if B % c == 0), None)
            if chunk is None:
                n = 1  # no safe chunking; fall back to single-image
            else:
                mec = ME.reshape(B // chunk, chunk, *ME.shape[1:])
                moc = MO.reshape(B // chunk, chunk, *MO.shape[1:])
                out = jax.lax.map(lambda t: call(t[0], t[1]), (mec, moc))
                return out.reshape(B, 64, 64, 64)
        if n > 1:
            return call(ME, MO)
    return pl.pallas_call(
        _conv1_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 64, 65, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 65, 65, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, 64, 64), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 64, 64, 64), dt),
        interpret=interpret,
    )(ME, MO, wa, wb, b1f)
