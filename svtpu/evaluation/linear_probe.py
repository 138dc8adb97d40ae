"""Linear-regression probe from RBVAE hidden states to pixels.

Rebuilds ``scripts/evaluation/linear_projection_eval/linear_regression_eval.py``
(reference :62-151): fit LinearRegression from h_seq embeddings to flattened
pixels; report R², MSE, MAE, explained variance; save an example
reconstruction."""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svtpu.evaluation.common import RBVAEBundle


def hidden_states(bundle: RBVAEBundle, frames: np.ndarray,
                  temperature: float = 0.2, chunk: int = 64) -> np.ndarray:
    """Encoder h_seq per frame (T=1 sequences) → ``[N, latent]``."""
    model = bundle.model

    @jax.jit
    def h_of(params, x):
        out = model.apply(params, x[:, None], temperature, False,
                          deterministic=True)
        return out.h_seq[:, 0]

    frames = np.asarray(frames)
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    parts = []
    for i in range(0, len(frames), chunk):
        part = frames[i:i + chunk]
        pad = chunk - len(part)
        if pad:
            part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
        h = h_of(bundle.params, jnp.asarray(part))
        parts.append(np.asarray(h)[:chunk - pad or None])
    return np.concatenate(parts)


def evaluate_linear_probe(bundle: RBVAEBundle, frames: np.ndarray,
                          targets01: Optional[np.ndarray] = None,
                          example_path: Optional[str | Path] = None) -> Dict:
    from sklearn.linear_model import LinearRegression
    from sklearn.metrics import (explained_variance_score,
                                 mean_absolute_error, mean_squared_error,
                                 r2_score)

    if targets01 is None:
        targets01 = frames
    if targets01.dtype == np.uint8:
        targets01 = targets01.astype(np.float32) / 255.0
    H = hidden_states(bundle, frames)
    Y = targets01.reshape(len(targets01), -1)
    reg = LinearRegression().fit(H, Y)
    pred = reg.predict(H)
    metrics = {
        "r2": float(r2_score(Y, pred)),
        "mse": float(mean_squared_error(Y, pred)),
        "mae": float(mean_absolute_error(Y, pred)),
        "explained_variance": float(explained_variance_score(Y, pred)),
    }
    if example_path is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        shape = targets01.shape[1:]
        axes[0].imshow(np.clip(targets01[0], 0, 1))
        axes[0].set_title("target")
        axes[1].imshow(np.clip(pred[0].reshape(shape), 0, 1))
        axes[1].set_title("linear reconstruction")
        for a in axes:
            a.axis("off")
        fig.tight_layout()
        fig.savefig(example_path, dpi=120)
        plt.close(fig)
    return metrics
