"""Batched, sharded perceptual-embedding precompute.

Replaces the reference's ``get_percep_embeddings.py`` (frame-at-a-time,
batch 1, full-SD instantiation including the unused UNet/CLIP —
``get_percep_embeddings.py:76-113``, SURVEY.md §3.1) with:

  * only the AutoencoderKL encoder (no UNet/CLIP load-time overhead),
  * batched encode under jit, frames sharded over the ``data`` mesh axis,
  * device-side [-1,1] normalization (uint8 travels to the device),
  * a deterministic mode (``posterior.mode()``) alongside the reference's
    stochastic ``posterior.sample()`` (``ddpm.py:542-549``).

Output keeps the reference's artifact format: a dict
``{"%010d.jpg": float32 [1, 4, H/8, W/8]}`` saved via ``np.save``, so the
percep-RBVAE layer and any existing reference consumers read it unchanged.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from svtpu.config import PerceptualConfig
from svtpu.models.autoencoder_kl import AutoencoderKL, DiagonalGaussian
from svtpu.parallel.mesh import batch_sharding, make_mesh, replicated


def preprocess_size(resize_wh: Tuple[int, int]) -> Tuple[int, int]:
    """(W, H) after the %32 snap (``get_percep_embeddings.py:59-66``):
    1280x720 → 1280x704."""
    w, h = resize_wh
    return (w - w % 32, h - h % 32)


def load_frame_pm1(path: str, resize_wh: Tuple[int, int]) -> np.ndarray:
    """Decode one frame the way the reference does: RGB → LANCZOS resize →
    %32 snap → uint8 HWC (normalization to [-1,1] happens on device)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = img.resize(resize_wh, Image.LANCZOS)
    w, h = preprocess_size(resize_wh)
    if (w, h) != resize_wh:
        img = img.resize((w, h), Image.LANCZOS)
    return np.asarray(img, np.uint8)


class PerceptualEncoder:
    """Jitted AutoencoderKL encode pipeline with data-parallel sharding."""

    def __init__(self, params, cfg: PerceptualConfig = PerceptualConfig(),
                 mesh=None, batch_size: int = 8, stochastic: bool = True,
                 seed: int = 0):
        self.cfg = cfg
        self.model = AutoencoderKL(cfg)
        self.params = params
        self.mesh = mesh if mesh is not None else make_mesh()
        # Batches shard over the data axis — round up to a multiple.
        ndata = int(self.mesh.devices.shape[0])
        self.batch_size = -(-batch_size // ndata) * ndata
        self.stochastic = stochastic
        self.seed = seed
        self._bsh = batch_sharding(self.mesh)
        self._rep = replicated(self.mesh)
        self.params = jax.device_put(params, self._rep)

        model, scale = self.model, cfg.scale_factor
        sto = stochastic

        def encode(params, frames_u8, key):
            x = frames_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            moments = model.apply(params, x, method=AutoencoderKL.encode)
            post = DiagonalGaussian.from_moments(moments)
            z = post.sample(key) if sto else post.mode()
            return (scale * z).astype(jnp.float32)

        self._encode = jax.jit(encode)

        def decode(params, z):
            x = model.apply(params, (z / scale).astype(jnp.float32),
                            method=AutoencoderKL.decode)
            return jnp.clip((x.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)

        self._decode = jax.jit(decode)

    def encode_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        """``[N, H, W, 3]`` uint8 → ``[N, H/8, W/8, 4]`` float32 latents."""
        n = len(frames_u8)
        key = jax.random.key(self.seed)
        out = []
        bs = self.batch_size
        for i in range(0, n, bs):
            part = frames_u8[i:i + bs]
            pad = bs - len(part)
            if pad:
                part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
            x = jax.device_put(jnp.asarray(part), self._bsh)
            z = self._encode(self.params, x, jax.random.fold_in(key, i))
            out.append(np.asarray(z)[:bs - pad])
        return np.concatenate(out) if out else np.zeros((0,), np.float32)

    def decode_latents(self, z_nhwc: np.ndarray) -> np.ndarray:
        """Scaled latents → [0,1] pixels (for the interpolation demo)."""
        from svtpu.parallel.mesh import pad_to_multiple

        ndata = int(self.mesh.devices.shape[0])
        z, n = pad_to_multiple(np.asarray(z_nhwc), ndata)
        out = self._decode(self.params,
                           jax.device_put(jnp.asarray(z), self._bsh))
        return np.asarray(out)[:n]


def precompute_embeddings(frames_dir: str | Path, out_path: str | Path,
                          params, cfg: PerceptualConfig = PerceptualConfig(),
                          batch_size: int = 8, stochastic: bool = True,
                          seed: int = 0, pattern: str = "*.jpg",
                          workers: int = 16) -> Dict[str, np.ndarray]:
    """Frames dir → ``<video>_perceps.npy``-format dict, batched on TPU.

    Host decode (LANCZOS, the reference's preprocessing) overlaps device
    encode: the thread pool decodes chunk k+1 while chunk k is on the TPU.
    """
    frames_dir = Path(frames_dir)
    paths = sorted(frames_dir.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no frames matching {pattern} in {frames_dir}")

    enc = PerceptualEncoder(params, cfg, batch_size=batch_size,
                            stochastic=stochastic, seed=seed)
    chunk = max(enc.batch_size * 4, 32)
    ex = ThreadPoolExecutor(max_workers=workers)

    def decode_chunk(i):
        part = paths[i:i + chunk]
        return np.stack(list(ex.map(
            lambda p: load_frame_pm1(str(p), cfg.resize_wh), part)))

    latents_parts = []
    pending = decode_chunk(0) if paths else None
    for i in range(0, len(paths), chunk):
        nxt = (ex.submit(decode_chunk, i + chunk)
               if i + chunk < len(paths) else None)
        enc.seed = seed + i   # decorrelate posterior noise across chunks
        latents_parts.append(enc.encode_frames(pending))
        pending = nxt.result() if nxt is not None else None
    ex.shutdown()
    latents = np.concatenate(latents_parts)    # [N, h, w, 4]
    emb = {p.name: np.transpose(z, (2, 0, 1))[None].astype(np.float32)
           for p, z in zip(paths, latents)}    # [1, 4, h, w] like reference
    if out_path:
        np.save(out_path, emb)                 # np.load(...).item() readable
    return emb
