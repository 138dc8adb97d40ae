"""Latent-space interpolation demo on the perceptual autoencoder.

Rebuilds ``scripts/pretrained_model_experiments/ldm_embedding_interpol.py``
(reference :46-72 lerp/slerp, :162-184 per-step decode): encode two images,
interpolate in SD latent space, decode each step — here all steps decode as
one device batch."""
from __future__ import annotations

from pathlib import Path
from typing import Literal

import numpy as np

from svtpu.perceptual.embed import PerceptualEncoder, load_frame_pm1


def lerp(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    return (1.0 - t) * a + t * b


def slerp(a: np.ndarray, b: np.ndarray, t: float,
          eps: float = 1e-8) -> np.ndarray:
    """Spherical interpolation on flattened latents; falls back to lerp for
    nearly-parallel vectors (the reference's threshold behavior)."""
    af, bf = a.reshape(-1), b.reshape(-1)
    na, nb = np.linalg.norm(af), np.linalg.norm(bf)
    dot = float(np.dot(af, bf) / max(na * nb, eps))
    dot = np.clip(dot, -1.0, 1.0)
    if abs(dot) > 0.9995:
        return lerp(a, b, t)
    theta = np.arccos(dot)
    s = np.sin(theta)
    return (np.sin((1 - t) * theta) / s) * a + (np.sin(t * theta) / s) * b


def interpolate_images(encoder: PerceptualEncoder,
                       image_a: str | np.ndarray, image_b: str | np.ndarray,
                       steps: int = 8,
                       mode: Literal["lerp", "slerp"] = "slerp",
                       out_path: str | Path | None = None) -> np.ndarray:
    """→ ``[steps, H, W, 3]`` decoded pixels in [0,1]."""
    cfg = encoder.cfg

    def load(x):
        if isinstance(x, (str, Path)):
            return load_frame_pm1(str(x), cfg.resize_wh)
        return np.asarray(x)

    frames = np.stack([load(image_a), load(image_b)])
    za, zb = encoder.encode_frames(frames)
    interp = slerp if mode == "slerp" else lerp
    ts = np.linspace(0.0, 1.0, steps)
    zs = np.stack([interp(za, zb, float(t)) for t in ts])
    decoded = encoder.decode_latents(zs)
    if out_path is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, steps, figsize=(2 * steps, 2.4))
        for ax, img, t in zip(np.atleast_1d(axes), decoded, ts):
            ax.imshow(np.clip(img, 0, 1))
            ax.set_title(f"t={t:.2f}", fontsize=8)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return decoded
