"""State-consistency evaluation with perturbation robustness.

Rebuilds ``scripts/evaluation/state_consistency_eval/embedding_matching.py``
(reference :209-299 for the metric, :141-193 for perturbations, :400-565 for
the trial protocol): for each model, the weighted fraction of *test* frames
whose hard binary code equals their state's modal code, under clean /
gaussian-noise / occlusion inputs, over N trials.

TPU-first: perturbations are jitted device ops applied to whole frame
batches; the percep path re-encodes perturbed pixels through the
AutoencoderKL in batches (the reference loops frame-by-frame through the
full SD model, :251-257)."""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from svtpu.data.segments import assign_label
from svtpu.evaluation.common import RBVAEBundle
from svtpu.ops.image import add_gaussian_noise, add_occlusion
from svtpu.training.trainer import modal_consistency

PERTURBATIONS = ("clean", "noise", "occlusion")


def perturb_frames(frames01: np.ndarray, kind: str, seed: int,
                   noise_std: float = 0.1,
                   occlusion_coverage: float = 0.2) -> np.ndarray:
    """Apply one perturbation to ``[N, H, W, C]`` float [0,1] frames."""
    if kind == "clean":
        return frames01
    x = jnp.asarray(frames01)
    key = jax.random.key(seed)
    if kind == "noise":
        out = jax.jit(add_gaussian_noise, static_argnums=(2,))(
            x, key, noise_std)
    elif kind == "occlusion":
        out = jax.jit(add_occlusion, static_argnums=(2,))(
            x, key, occlusion_coverage)
    else:
        raise ValueError(kind)
    return np.asarray(out)


def perturb_embeddings(emb: np.ndarray, kind: str, seed: int,
                       noise_std: float = 0.1,
                       occlusion_coverage: float = 0.2) -> np.ndarray:
    """Embedding-space analogue of the pixel perturbations, for percep
    models when no SD checkpoint is available (zero-egress environments —
    the reference re-encodes perturbed pixels through SD,
    ``embedding_matching.py:251-257``, which needs the checkpoint).
    Gaussian noise is scaled by the embedding std so σ=0.1 keeps the
    reference's relative magnitude; occlusion zeroes a random square of
    ~``coverage`` of the latent spatial grid (the latent footprint of a
    pixel occlusion; one square per trial). ``emb``: ``[N, H, W, C]``."""
    if kind == "clean":
        return emb
    x = jnp.asarray(emb)
    key = jax.random.key(seed)
    if kind == "noise":
        out = x + (noise_std * float(np.std(emb))
                   * jax.random.normal(key, x.shape, x.dtype))
    elif kind == "occlusion":
        _, H, W, _ = x.shape
        side_h = max(1, int(H * occlusion_coverage ** 0.5))
        side_w = max(1, int(W * occlusion_coverage ** 0.5))
        k1, k2 = jax.random.split(key)
        top = jax.random.randint(k1, (), 0, H - side_h + 1)
        left = jax.random.randint(k2, (), 0, W - side_w + 1)
        rows = jnp.arange(H)[None, :, None, None]
        cols = jnp.arange(W)[None, None, :, None]
        mask = ((rows >= top) & (rows < top + side_h)
                & (cols >= left) & (cols < left + side_w))
        out = jnp.where(mask, 0.0, x)
    else:
        raise ValueError(kind)
    return np.asarray(out)


@dataclasses.dataclass
class ConsistencyResult:
    model_name: str
    perturbation: str
    mean: float
    std: float
    trials: List[float]


def evaluate_consistency(
        bundle: RBVAEBundle,
        test_frames01: np.ndarray,
        test_indices: Sequence[int],
        flags: Sequence[int],
        num_trials: int = 10,
        temperature: float = 0.2,
        noise_ratio: float = 0.1,
        perturbations: Sequence[str] = PERTURBATIONS,
        pixel_to_input: Optional[Callable[[np.ndarray, int], np.ndarray]]
        = None,
        perturb_fn: Callable[..., np.ndarray] = perturb_frames,
        seed: int = 0,
        labels: Optional[Sequence[int]] = None) -> List[ConsistencyResult]:
    """Run the trial protocol for one model.

    Args:
      test_frames01: ``[N, H, W, C]`` float [0,1] *pixel* frames (the
        perturbations are defined in pixel space even for the percep model).
      pixel_to_input: optional map from perturbed pixels to the model's
        input space (the SD encode step for percep models); receives
        ``(frames01, trial_seed)``.
      labels: optional explicit per-frame state labels (multi-video
        evaluation uses one GLOBAL state axis across videos, so labels
        cannot be derived from one video's transition flags). When given,
        ``flags``/``test_indices`` are ignored for labeling.
    """
    if labels is not None:
        labels = np.asarray(labels)
        num_states = int(labels.max()) + 1
    else:
        labels = np.asarray([assign_label(i, flags) for i in test_indices])
        num_states = len(flags) + 1
    results = []
    for kind in perturbations:
        scores = []
        for trial in range(num_trials):
            s = seed + 1000 * trial
            frames = perturb_fn(test_frames01, kind, s)
            x = pixel_to_input(frames, s) if pixel_to_input else frames
            codes = bundle.encode(x, temperature=temperature, hard=True,
                                  noise=True, noise_ratio=noise_ratio,
                                  seed=s + 1)
            w, _ = modal_consistency(codes, labels, num_states)
            scores.append(w)
        results.append(ConsistencyResult(
            bundle.name, kind, float(np.mean(scores)),
            float(np.std(scores)), scores))
    return results


def write_csv(results: Sequence[ConsistencyResult], path: str | Path):
    """Mean/std CSV like the reference's (``embedding_matching.py:500-530``)."""
    lines = ["model,perturbation,mean,std"]
    for r in results:
        lines.append(f"{r.model_name},{r.perturbation},{r.mean:.6f},"
                     f"{r.std:.6f}")
    Path(path).write_text("\n".join(lines) + "\n")


def plot_results(results: Sequence[ConsistencyResult], path: str | Path,
                 title: str = "State consistency under perturbation"):
    """Grouped bar chart (``embedding_matching.py:533-565``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    models = sorted({r.model_name for r in results})
    kinds = [k for k in PERTURBATIONS
             if any(r.perturbation == k for r in results)]
    x = np.arange(len(kinds))
    width = 0.8 / max(len(models), 1)
    fig, ax = plt.subplots(figsize=(8, 5))
    for mi, m in enumerate(models):
        means = [next(r.mean for r in results
                      if r.model_name == m and r.perturbation == k)
                 for k in kinds]
        stds = [next(r.std for r in results
                     if r.model_name == m and r.perturbation == k)
                for k in kinds]
        ax.bar(x + mi * width, means, width, yerr=stds, capsize=4, label=m)
    ax.set_xticks(x + width * (len(models) - 1) / 2)
    ax.set_xticklabels(kinds)
    ax.set_ylabel("weighted consistency")
    ax.set_ylim(0, 1.05)
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
