"""End-to-end video → binary-symbol serving pipeline.

The production-facing composition of the whole stack (the reference has no
such API — users hand-chain frame extraction, embedding precompute, and
per-frame ``model.encode`` loops):

  native/cv2 video decode (streamed)
    → device: uint8 → f32, bilinear resize, [0,1] (or [-1,1] → SD encode)
    → RBVAE encode (hard Binary-Concrete codes)

Decode runs on a background thread ``depth`` batches ahead of the device
(``svtpu.data.prefetch`` pattern); every device step is one fused jit call
over a full batch.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from svtpu.config import RBVAEConfig
from svtpu.models.rbvae import Seq2SeqBinaryVAE


class VideoSymbolPipeline:
    """Video file / frame stream → ``[N, latent]`` binary codes.

    Args:
      cfg / params: the RBVAE model.
      percep: optional ``PerceptualEncoder`` — when given, frames are
        SD-encoded first (the percep-RBVAE path); resize then targets the
        SD input size instead of the RBVAE's.
      batch: frames per device step.
      temperature / noise: encode protocol (defaults = reference eval:
        temp 0.2, hard, noise on).
    """

    def __init__(self, cfg: RBVAEConfig, params, *, percep=None,
                 batch: int = 64, temperature: float = 0.2,
                 hard: bool = True, noise: bool = True,
                 noise_ratio: float = 0.1, seed: int = 0, depth: int = 2,
                 resize_on: str = "device"):
        self.cfg = cfg
        self.model = Seq2SeqBinaryVAE(cfg)
        self.params = params
        self.percep = percep
        self.batch = batch
        self.temperature = temperature
        self.hard = hard
        self.noise = noise
        self.noise_ratio = noise_ratio
        self.seed = seed
        self.depth = depth
        # resize_on="device" minimizes host work (right when host→device
        # bandwidth is plentiful); "host" shrinks frames before transfer
        # (right on slow links — 5x fewer bytes for 768x432 → 256x256).
        self.resize_on = resize_on

        model = self.model
        if percep is None:
            target_hw = cfg.input_hw
            on_device = resize_on == "device"

            def encode(params, frames_u8, key):
                x = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
                if on_device:
                    x = jax.image.resize(
                        x, (x.shape[0],) + target_hw + (x.shape[-1],),
                        method="bilinear")
                z = model.apply(params, x[:, None], temperature, hard,
                                noise_ratio,
                                method=Seq2SeqBinaryVAE.encode,
                                deterministic=not noise,
                                bc_rng=key if noise else None)
                return z[:, 0].astype(jnp.uint8 if hard else jnp.float32)

            self._encode = jax.jit(encode)
        else:
            from svtpu.perceptual.embed import preprocess_size

            w, h = preprocess_size(percep.cfg.resize_wh)
            self._sd_hw = (h, w)

            def encode_emb(params, emb, key):
                z = model.apply(params, emb[:, None], temperature, hard,
                                noise_ratio,
                                method=Seq2SeqBinaryVAE.encode,
                                deterministic=not noise,
                                bc_rng=key if noise else None)
                return z[:, 0].astype(jnp.uint8 if hard else jnp.float32)

            self._encode = jax.jit(encode_emb)

    # ------------------------------------------------------------- frames

    def _frame_batches(self, video_path: str) -> Iterator[np.ndarray]:
        from svtpu.data import native
        from svtpu.data.frames import BACKENDS

        it = (BACKENDS["native"] if native.available()
              else BACKENDS["cv2"])(video_path)
        buf = []
        for frame in it:
            buf.append(frame)
            if len(buf) == self.batch:
                yield np.stack(buf), self.batch
                buf = []
        if buf:
            pad = self.batch - len(buf)
            yield (np.concatenate(
                [np.stack(buf), np.repeat(buf[-1][None], pad, 0)]),
                len(buf))

    def run_video(self, video_path: str,
                  limit: Optional[int] = None) -> np.ndarray:
        """Decode + encode a whole video → ``[num_frames, latent]``."""
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        END = object()
        n_total = [0]

        def producer():
            n = 0
            for b, valid in self._frame_batches(video_path):
                take = valid
                if limit is not None:
                    take = min(valid, limit - n)
                    if take <= 0:
                        break
                q.put((b, take))
                n += take
            n_total[0] = n
            q.put(END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        key = jax.random.key(self.seed)
        out, i = [], 0
        while True:
            item = q.get()
            if item is END:
                break
            batch_np, take = item
            codes = self.run_frames(batch_np,
                                    key=jax.random.fold_in(key, i))
            out.append(codes[:take])
            i += 1
        return np.concatenate(out) if out else np.zeros(
            (0, self.cfg.latent_dim))

    def run_frames(self, frames_u8: np.ndarray, key=None) -> np.ndarray:
        """Encode one uint8 frame batch (decode-resolution HWC)."""
        if key is None:
            key = jax.random.key(self.seed)
        if self.percep is not None:
            # Resize on host to the SD input, encode through the AE, then
            # the RBVAE (both batched device calls).
            import cv2

            h, w = self._sd_hw
            resized = np.stack([cv2.resize(f, (w, h),
                                           interpolation=cv2.INTER_LINEAR)
                                for f in frames_u8])
            emb = self.percep.encode_frames(resized)
            return np.asarray(self._encode(self.params, jnp.asarray(emb),
                                           key))
        if self.resize_on == "host" and frames_u8.shape[1:3] != \
                self.cfg.input_hw:
            import cv2

            th, tw = self.cfg.input_hw
            frames_u8 = np.stack([
                cv2.resize(f, (tw, th), interpolation=cv2.INTER_LINEAR)
                for f in frames_u8])
        return np.asarray(self._encode(self.params,
                                       jnp.asarray(frames_u8), key))
