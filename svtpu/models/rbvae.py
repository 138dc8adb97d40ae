"""Recurrent Binary VAE — one parameterized module covering all four
reference variants (SURVEY.md §2.2):

  * simple      — ``models/simple_RBVAE/simple_RBVAE_model.py:77-193``
                  (64x64 input, k4 convs 64/128/256, binarize *before* the
                  LSTMs, 1-layer LSTMs)
  * contrastive — ``models/contrastive_RBVAE/contrastive_RBVAE_model.py:45-191``
                  (256x256, k3 convs 64/64/64 + dropout, binarize on encoder
                  LSTM output, 2-layer LSTMs)
  * percep      — ``models/percep_RBVAE/percep_RBVAE_model.py:46-191``
                  (SD latents [88,160,4], convs 256^3, 4-layer LSTMs)
  * triplet     — ``models/triplet_RBVAE/triplet_RBVAE_model.py:47-193``
                  (same as contrastive, unscaled logistic noise)

TPU-first design decisions:
  * NHWC activations end-to-end; inputs are ``[B, T, H, W, C]``. Time is
    folded into batch for the conv trunk (one big conv per stage instead of
    the reference's implicit reshape) so the MXU sees ``B*T``-sized batches.
  * Compute dtype configurable (bf16 on TPU); parameters stay fp32.
  * All stochasticity (dropout, Binary-Concrete noise) flows through explicit
    PRNG keys — nothing reads global RNG state.
  * ``hidden_dim`` is wired to ``latent_dim`` exactly as every reference
    variant does internally (``contrastive_RBVAE_model.py:139-140``).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from svtpu.config import RBVAEConfig
from svtpu.ops.binarize import binary_concrete
from svtpu.ops.conv import (ConvParams, ConvTranspose2dTorch, Dense,
                            conv2d_int8, conv2d_torch_apply)
from svtpu.ops.conv_trunk_pallas import fused_conv01
from svtpu.ops.lstm import LSTM


class RBVAEOutput(NamedTuple):
    x_recon: jax.Array        # [B, T, H, W, C]
    h_seq: jax.Array          # [B, T, L] encoder-LSTM output (pre-binarize
    #                           for post_rnn variants; post-binarize z for
    #                           the simple variant, matching its return)
    z_seq: jax.Array          # [B, T, L] binarized latents
    logits: jax.Array         # [B, T, L] conv-encoder logits


class ConvEncoder(nn.Module):
    cfg: RBVAEConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 trunk: str = "xla") -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        h = x.astype(dtype)
        n = len(c.conv_features)
        # Parameters are declared via ConvParams holders (identical tree
        # and init to Conv2dTorch children) so the same weights can be
        # routed through either the generic XLA convs or the fused Pallas
        # trunk (ops/conv_trunk_pallas.py).
        wb, in_ch = [], h.shape[-1]
        for i, feats in enumerate(c.conv_features):
            wb.append(ConvParams(feats, in_ch, c.conv_kernel,
                                 name=f"conv_{i}")())
            in_ch = feats
        if trunk == "pallas":
            assert deterministic, "pallas trunk is inference-only"
            assert (n == 3 and c.conv_features == (64, 64, 64)
                    and (c.conv_kernel, c.conv_stride, c.conv_padding)
                    == (3, 2, 1) and h.shape[1:3] == (256, 256)), (
                "pallas_trunk supports only the contrastive/triplet "
                "pixel geometry")
            h = fused_conv01(h, wb[0][0], wb[0][1], wb[1][0], wb[1][1],
                             interpret=jax.default_backend() != "tpu",
                             block_n=c.pallas_trunk_block)
            h = conv2d_torch_apply(h, *wb[2], c.conv_stride,
                                   c.conv_padding, dtype)
        elif trunk == "int8":
            assert deterministic, "int8 trunk is inference-only"
            # conv0 stays in compute dtype (thin C_in; XLA's internal
            # transform already runs it near its roofline — RESULTS.md
            # encode breakdown); the wide convs that dominate the path
            # run int8 on the MXU (2x bf16 peak on v5e).
            for i, (w, b) in enumerate(wb):
                if i == 0:
                    h = conv2d_torch_apply(h, w, b, c.conv_stride,
                                           c.conv_padding, dtype)
                else:
                    h = conv2d_int8(h, w, b, c.conv_stride,
                                    c.conv_padding, dtype)
                if i < n - 1 or c.conv_final_relu:
                    h = jax.nn.relu(h)
        else:
            for i, (w, b) in enumerate(wb):
                h = conv2d_torch_apply(h, w, b, c.conv_stride,
                                       c.conv_padding, dtype,
                                       s2d=(i == 0 and c.conv0_s2d))
                # The reference applies ReLU(+Dropout) between convs; the
                # simple variant ALSO ReLUs the last conv
                # (``simple_RBVAE_model.py:82-89``), the others do not
                # (``contrastive_RBVAE_model.py:49-58``).
                if i < n - 1 or c.conv_final_relu:
                    h = jax.nn.relu(h)
                    if i < n - 1 and c.conv_dropout > 0:
                        h = nn.Dropout(c.conv_dropout,
                                       deterministic=deterministic)(h)
        h = h.reshape(h.shape[0], -1)
        return Dense(c.latent_dim, dtype=dtype, name="fc")(h)


class ConvDecoder(nn.Module):
    cfg: RBVAEConfig

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        eh, ew = c.encoded_hw
        feats = tuple(reversed(c.conv_features))
        h = Dense(feats[0] * eh * ew, dtype=dtype, name="fc")(z)
        h = h.reshape(-1, eh, ew, feats[0])
        # Transposed-conv stack mirrors the encoder; output_padding chosen so
        # that each stage exactly doubles spatial dims (reference uses
        # output_padding=1 for k3 and 0 for k4 — both give 2x).
        op = 1 if c.conv_kernel == 3 else 0
        stages = feats[1:] + (c.out_channels,)
        n = len(stages)
        for i, f in enumerate(stages):
            h = ConvTranspose2dTorch(f, c.conv_kernel, c.conv_stride,
                                     c.conv_padding, op, dtype=dtype,
                                     d2s=c.deconv_d2s,
                                     name=f"deconv_{i}")(h)
            if i < n - 1:
                h = jax.nn.relu(h)
                if c.conv_dropout > 0:
                    h = nn.Dropout(c.conv_dropout, deterministic=deterministic)(h)
        if c.decoder_sigmoid:
            h = jax.nn.sigmoid(h)
        return h


class Seq2SeqBinaryVAE(nn.Module):
    """CNN → LSTM → Binary-Concrete → LSTM → CNN sequence autoencoder."""

    cfg: RBVAEConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        enc_cls, dec_cls = ConvEncoder, ConvDecoder
        if c.remat:
            # Recompute conv-trunk activations in the backward pass instead
            # of holding them in HBM (jax.checkpoint via nn.remat).
            enc_cls = nn.remat(ConvEncoder, static_argnums=(2, 3))
            dec_cls = nn.remat(ConvDecoder, static_argnums=(2,))
        self.encoder_cnn = enc_cls(c, name="encoder_cnn")
        self.decoder_cnn = dec_cls(c, name="decoder_cnn")
        self.encoder_rnn = LSTM(c.latent_dim, c.lstm_layers, dtype=dtype,
                                residual=c.lstm_residual, name="encoder_rnn")
        self.decoder_rnn = LSTM(c.latent_dim, c.lstm_layers, dtype=dtype,
                                residual=c.lstm_residual, name="decoder_rnn")

    def _encode_to_latent(self, x, temperature, hard, noise_scale, key,
                          deterministic, sampler: str = "xla",
                          trunk: str = "xla"):
        """Shared front half: conv trunk + encoder LSTM + binarization.

        ``sampler``: "xla" (default; differentiable) or "pallas" (fused
        on-chip-PRNG kernel, inference only — no VJP).
        ``trunk``: "xla" or "pallas" (fused VMEM-resident conv1→conv2
        kernel, inference only — contrastive/triplet pixel geometry).
        """
        c = self.cfg

        def binarize(logits_or_h):
            if sampler == "pallas":
                from svtpu.ops.binarize_pallas import binary_concrete_pallas
                noisy = key is not None
                seed = (jax.random.randint(key, (), 0, 2**31 - 1)
                        if noisy else 0)
                return binary_concrete_pallas(
                    logits_or_h, seed, temperature, noise_scale, hard=hard,
                    eps=c.bc_eps, noisy=noisy)
            return binary_concrete(logits_or_h, key, temperature, hard,
                                   eps=c.bc_eps, noise_scale=noise_scale)

        B, T = x.shape[:2]
        flat = x.reshape((B * T,) + x.shape[2:])
        logits = self.encoder_cnn(flat, deterministic, trunk)
        logits = logits.reshape(B, T, c.latent_dim)

        if c.binarize == "pre_rnn":
            # simple variant: binarize conv logits, then run the LSTMs.
            z_seq = binarize(logits)
            h_seq = self.encoder_rnn(z_seq)
            return logits, h_seq, z_seq
        h_seq = self.encoder_rnn(logits)
        z_seq = binarize(h_seq)
        return logits, h_seq, z_seq

    def __call__(self, x: jax.Array, temperature=1.0, hard: bool = False,
                 noise_ratio: float = 0.1, *, deterministic: bool = False,
                 bc_rng: Optional[jax.Array] = None) -> RBVAEOutput:
        """Full autoencoding pass.

        Args:
          x: ``[B, T, H, W, C]`` frame (or embedding) sequences, NHWC.
          temperature: Binary-Concrete temperature (static or traced).
          hard: straight-through discretization.
          noise_ratio: logistic-noise multiplier; only honored for variants
            that have it (contrastive/percep); simple/triplet use 1.0.
          deterministic: disables dropout AND Binary-Concrete noise when no
            ``bc_rng`` is supplied.
          bc_rng: explicit key for the Binary-Concrete noise; if None, pulled
            from the "binary" RNG collection unless ``deterministic``.
        """
        c = self.cfg
        B, T = x.shape[:2]
        noise_scale = noise_ratio if c.has_noise_ratio else 1.0
        if bc_rng is None and not deterministic:
            bc_rng = self.make_rng("binary")

        logits, h_seq, z_seq = self._encode_to_latent(
            x, temperature, hard, noise_scale, bc_rng, deterministic)

        if c.binarize == "pre_rnn":
            d_in = h_seq       # simple: decoder consumes encoder-LSTM output
        else:
            d_in = z_seq       # others: decoder consumes binarized latents
        d_seq = self.decoder_rnn(d_in)
        d_flat = d_seq.reshape(B * T, c.latent_dim)
        x_recon = self.decoder_cnn(d_flat, deterministic)
        x_recon = x_recon.reshape((B, T) + x_recon.shape[1:])
        return RBVAEOutput(x_recon=x_recon, h_seq=h_seq, z_seq=z_seq,
                           logits=logits)

    def encode(self, x: jax.Array, temperature=0.5, hard: bool = False,
               noise_ratio: float = 0.1, *, deterministic: bool = True,
               bc_rng: Optional[jax.Array] = None) -> jax.Array:
        """Binarized latents only (reference ``.encode``,
        ``contrastive_RBVAE_model.py:171-190``). Default deterministic: the
        reference always injects noise even at eval — pass ``bc_rng`` (or
        ``deterministic=False`` under an RNG scope) to reproduce that."""
        c = self.cfg
        noise_scale = noise_ratio if c.has_noise_ratio else 1.0
        if bc_rng is None and not deterministic:
            bc_rng = self.make_rng("binary")
        _, _, z_seq = self._encode_to_latent(
            x, temperature, hard, noise_scale, bc_rng, True,
            sampler="pallas" if c.pallas_sampler else "xla",
            trunk=("pallas" if c.pallas_trunk
                   else "int8" if c.int8_trunk else "xla"))
        return z_seq
