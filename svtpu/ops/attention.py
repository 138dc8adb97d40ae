"""Single-head spatial attention for the AutoencoderKL mid-block.

The reference's ``AttnBlock`` (vendored
``ldm/modules/diffusionmodules/model.py:150-202``) materializes a full
``[HW, HW]`` softmax attention matrix — at the SD encoder's bottleneck the
token count is 88*160 = 14,080, i.e. a ~800 MB f32 score matrix per image.
Here that becomes a Pallas flash-attention kernel: blocked online-softmax,
scores never leave VMEM, HBM traffic is O(N*D) instead of O(N^2).

A pure-XLA blocked fallback (same math, ``lax.map`` over query chunks) is
used on CPU/interpret paths and as the numerical reference in tests.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, nk: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Keep native dtype (bf16 on TPU) as MXU input; accumulate in f32.
    q = q_ref[0]                                 # [BQ, D]
    k = k_ref[0]                                 # [BK, D]
    v = v_ref[0]                                 # [BK, D]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m_prev = m_ref[:]                            # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                       # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)              # [BQ, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _final():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pick_block(n: int, candidates=(1408, 1024, 704, 512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def _vmem_bytes(bq: int, bk: int, d: int, itemsize: int) -> int:
    """Rough VMEM need: double-buffered q/k/v blocks + f32 scores, weights,
    and accumulator."""
    io = 2 * (bq + 2 * bk) * d * itemsize          # pipelined in-blocks
    score = 2 * bq * bk * 4                        # s and p
    acc = bq * d * 4 + 2 * bq * 4 + bq * d * itemsize  # acc, m, l, out
    return io + score + acc


def _pick_blocks(n: int, d: int, itemsize: int,
                 budget: int = 12 << 20) -> tuple[int, int]:
    """Largest (block_q, block_k) dividing n that fits the VMEM budget."""
    for bq in (512, 256, 128):
        if n % bq:
            continue
        for bk in (1408, 1024, 704, 512, 256, 128):
            if n % bk:
                continue
            if _vmem_bytes(bq, bk, d, itemsize) <= budget:
                return bq, bk
    return 0, 0


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int | None = None, block_k: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """Non-causal single-head attention, ``softmax(q kᵀ / sqrt(D)) v``.

    Args:
      q, k, v: ``[B, N, D]``. N is padded internally to the block size
        (padding keys are masked by construction: they get score ≈ 0 weight
        because we pad q/k with zeros and slice the output — zero keys give
        uniform-ish weights, so instead we pad N up and mask via NEG_INF
        bias on padded keys).
    """
    B, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    if not block_q or not block_k:
        auto_q, auto_k = _pick_blocks(N, D, q.dtype.itemsize)
        block_q = block_q or auto_q
        block_k = block_k or auto_k
    if not block_q or not block_k or N % block_q or N % block_k:
        # Ragged N: the blocked XLA path handles padding exactly.
        return blocked_attention(q, k, v)

    nq = N // block_q
    nk = N // block_k
    kernel = functools.partial(_flash_kernel, scale=scale, nk=nk)
    out = pl.pallas_call(
        kernel,
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out


def blocked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      chunk: int = 1024) -> jax.Array:
    """XLA fallback: query-chunked attention; peak memory O(chunk * N)."""
    B, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    kT = jnp.swapaxes(k, -1, -2)

    pad = (-N) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))) if pad else q
    nchunks = qp.shape[1] // chunk
    qc = qp.reshape(B, nchunks, chunk, D)

    def one(qb):  # [B, chunk, D]
        s = jnp.einsum("bqd,bdk->bqk", qb.astype(jnp.float32),
                       kT.astype(jnp.float32)) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p,
                          v.astype(jnp.float32)).astype(q.dtype)

    out = jax.lax.map(one, jnp.swapaxes(qc, 0, 1))   # [nchunks, B, chunk, D]
    out = jnp.swapaxes(out, 0, 1).reshape(B, -1, D)
    return out[:, :N]


def _attention_bwd_chunked(q, k, v, g, chunk: int = 1024):
    """Memory-bounded attention backward (recompute, query-chunked):
    standard softmax-attention gradients with peak memory O(chunk * N)."""
    B, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    qf, kf, vf, gf = (a.astype(jnp.float32) for a in (q, k, v, g))

    pad = (-N) % chunk
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))
    nq = qf.shape[1] // chunk
    qc = jnp.swapaxes(qf.reshape(B, nq, chunk, D), 0, 1)
    gc = jnp.swapaxes(gf.reshape(B, nq, chunk, D), 0, 1)

    def per_chunk(args):
        qb, gb = args                                     # [B, chunk, D]
        s = jnp.einsum("bqd,bkd->bqk", qb, kf) * scale
        p = jax.nn.softmax(s, axis=-1)                    # [B, chunk, N]
        dp = jnp.einsum("bqd,bkd->bqk", gb, vf)
        dv = jnp.einsum("bqk,bqd->bkd", p, gb)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
        dk = jnp.einsum("bqk,bqd->bkd", ds, qb) * scale
        return dq, dk, dv

    dq_c, dk_c, dv_c = jax.lax.map(per_chunk, (qc, gc))
    dq = jnp.swapaxes(dq_c, 0, 1).reshape(B, -1, D)[:, :N]
    dk = jnp.sum(dk_c, axis=0)
    dv = jnp.sum(dv_c, axis=0)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_ad(q, k, v, use_pallas: bool):
    if use_pallas:
        return flash_attention(q, k, v)
    return blocked_attention(q, k, v)


def _attention_ad_fwd(q, k, v, use_pallas):
    return _attention_ad(q, k, v, use_pallas), (q, k, v)


def _attention_ad_bwd(use_pallas, res, g):
    q, k, v = res
    return _attention_bwd_chunked(q, k, v, g)


_attention_ad.defvjp(_attention_ad_fwd, _attention_ad_bwd)


def attention(q, k, v, *, use_pallas: bool | None = None,
              interpret: bool = False):
    """Dispatch: Pallas flash kernel on TPU, blocked XLA elsewhere.

    Differentiable: the backward pass is a query-chunked recompute
    (``_attention_bwd_chunked``), so fine-tuning through the perceptual
    encoder works even though the forward is a Pallas kernel.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if interpret:
        return flash_attention(q, k, v, interpret=True)
    return _attention_ad(q, k, v, bool(use_pallas))
