"""Shared evaluation utilities: model bundles and batched encoding."""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from svtpu.config import RBVAEConfig
from svtpu.models.rbvae import Seq2SeqBinaryVAE


@dataclasses.dataclass
class RBVAEBundle:
    """A model + params pair, the unit every eval consumes.

    Mirrors the reference's pattern of loading ``best_model_*.pt``
    checkpoints into a constructed model
    (``embedding_matching.py:366-388``).
    """

    cfg: RBVAEConfig
    params: dict
    name: str = "rbvae"

    def __post_init__(self):
        self.model = Seq2SeqBinaryVAE(self.cfg)
        self._enc_jit = None

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, cfg: RBVAEConfig,
                        which: str = "best", name: str = "rbvae"):
        from svtpu.training.checkpoints import BestCheckpointer

        tree, _meta = BestCheckpointer(ckpt_dir).restore(which)
        return cls(cfg=cfg, params=tree["params"], name=name)

    def encode(self, frames: np.ndarray, temperature: float = 0.2,
               hard: bool = True, noise: bool = True,
               noise_ratio: float = 0.1, seed: int = 0,
               chunk: int = 128) -> np.ndarray:
        """Batched single-frame encode → ``[N, latent]`` codes.

        Matches the reference eval protocol (temp 0.2, hard=True, noise on —
        ``embedding_matching.py:264, 415-416``) but runs ``chunk`` frames per
        device step instead of one.
        """
        model = self.model
        if self._enc_jit is None:
            def enc(params, x, key, temp, nr, hard, noise):
                return model.apply(
                    params, x[:, None], temp, hard, nr,
                    method=Seq2SeqBinaryVAE.encode,
                    deterministic=not noise,
                    bc_rng=key if noise else None)
            self._enc_jit = jax.jit(enc, static_argnums=(5, 6))
        enc = self._enc_jit

        frames = np.asarray(frames)
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
        key = jax.random.key(seed)
        out = []
        for i in range(0, len(frames), chunk):
            part = frames[i:i + chunk]
            pad = chunk - len(part)
            if pad:
                part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
            z = enc(self.params, jnp.asarray(part),
                    jax.random.fold_in(key, i),
                    jnp.float32(temperature), jnp.float32(noise_ratio),
                    hard, noise)
            out.append(np.asarray(z)[:, 0][:chunk - pad or None])
        return np.concatenate(out)
