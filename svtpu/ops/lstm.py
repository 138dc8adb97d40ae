"""Multi-layer LSTM, TPU-first.

Replaces the reference's ``nn.LSTM`` encoder/decoder RNNs
(``contrastive_RBVAE_model.py:93-121``; 1/2/4 layers depending on variant).

Design notes (why this is not a torch translation):
  * The input projection ``x_t @ W_ih`` for *all* timesteps of *all* layers'
    inputs is hoisted out of the recurrence into one big ``[B*T, D] @ [D, 4H]``
    matmul — MXU-friendly — so the ``lax.scan`` body only contains the
    unavoidable ``[B, H] @ [H, 4H]`` recurrent matmul plus elementwise gates.
  * Sequence lengths here are tiny (T = number of states per video, 5–17),
    so the scan serialization cost is negligible; the batch dimension carries
    the parallelism and is sharded over the ``data`` mesh axis by the trainer.
  * Gate math matches torch exactly (gate order i, f, g, o; double bias
    ``b_ih + b_hh`` folded into one) so checkpoints port 1:1.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTM(nn.Module):
    """Stacked unidirectional LSTM over ``[B, T, D]`` inputs.

    Parameters per layer l: ``w_ih [D_l, 4H]``, ``w_hh [H, 4H]``, ``b [4H]``.
    Gate order along the 4H axis is torch's (input, forget, cell, output).
    """

    hidden_size: int
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32
    # Residual stacking: h_l = h_{l-1} + LSTM_l(h_{l-1}) wherever the
    # layer preserves width. svtpu extension (the reference has none):
    # motivated by the round-3 percep diagnosis — 4 stacked plain LSTMs
    # starve the downstream binarization logits (|h| stuck ~0.01-0.09 at
    # the flagship lr, RESULTS.md "Percep collapse"); the identity path
    # restores gradient/signal flow at depth.
    residual: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        H = self.hidden_size
        h = x.astype(self.dtype)
        for layer in range(self.num_layers):
            d_in = h.shape[-1]
            scale = 1.0 / jnp.sqrt(H)
            init = nn.initializers.uniform(scale=2 * scale)

            def shifted(key, shape, dtype, _init=init, _s=scale):
                return _init(key, shape, dtype) - _s

            w_ih = self.param(f"w_ih_{layer}", shifted, (d_in, 4 * H),
                              jnp.float32)
            w_hh = self.param(f"w_hh_{layer}", shifted, (H, 4 * H),
                              jnp.float32)
            b = self.param(f"b_{layer}", shifted, (4 * H,), jnp.float32)

            # Hoisted input projection: one [B*T, D] @ [D, 4H] matmul.
            gates_x = (h.reshape(B * T, d_in) @ w_ih.astype(self.dtype)
                       + b.astype(self.dtype)).reshape(B, T, 4 * H)

            def step(carry, gx, _w=w_hh):
                h_prev, c_prev = carry
                g = gx + h_prev @ _w.astype(self.dtype)
                i, f, gc, o = jnp.split(g, 4, axis=-1)
                i = jax.nn.sigmoid(i)
                f = jax.nn.sigmoid(f)
                gc = jnp.tanh(gc)
                o = jax.nn.sigmoid(o)
                c = f * c_prev + i * gc
                h_new = o * jnp.tanh(c)
                return (h_new, c), h_new

            h0 = jnp.zeros((B, H), self.dtype)
            c0 = jnp.zeros((B, H), self.dtype)
            _, hs = jax.lax.scan(step, (h0, c0),
                                 jnp.swapaxes(gates_x, 0, 1))
            out = jnp.swapaxes(hs, 0, 1)  # [B, T, H]
            h = h + out if (self.residual and d_in == H) else out
        return h
