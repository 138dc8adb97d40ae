"""Consistency-vs-separation trade-off over a sweep's checkpoints.

The reference selects models by within-state consistency alone
(``contrastive_RBVAE_train.py:662-673``), a metric that is blind to all
states collapsing onto one code (DESIGN.md §8). svtpu sweeps additionally
track deterministic adjacent-state separation; this module re-evaluates
every saved sweep checkpoint on one split and emits the joint
(consistency, separation) table + scatter chart — the published trade-off
curve for the ``contrast_on="z"`` formulation.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from svtpu.data.segments import assign_label
from svtpu.evaluation.common import RBVAEBundle
from svtpu.evaluation.hamming import adjacent_hamming, modal_codes
from svtpu.training.trainer import modal_consistency


@dataclasses.dataclass
class TradeoffPoint:
    run: str
    consistency: float          # eval protocol: hard, temp, noise on
    separation: float           # deterministic modal adjacent Hamming, bits
    det_consistency: float      # hard, noise off (upper bound)
    config: dict


def evaluate_checkpoint(bundle: RBVAEBundle, frames: np.ndarray,
                        frame_indices: Sequence[int], flags: Sequence[int],
                        temperature: float = 0.2, noise_ratio: float = 0.1,
                        seed: int = 0):
    """(stochastic consistency, deterministic separation, deterministic
    consistency) for one model on one frame set."""
    labels = np.asarray([assign_label(i, flags) for i in frame_indices])
    num_states = len(flags) + 1
    codes = bundle.encode(frames, temperature=temperature, hard=True,
                          noise=True, noise_ratio=noise_ratio, seed=seed)
    w, _ = modal_consistency(codes, labels, num_states)
    det = bundle.encode(frames, temperature=temperature, hard=True,
                        noise=False, seed=seed)
    wd, _ = modal_consistency(det, labels, num_states)
    ham = adjacent_hamming(modal_codes(det, labels, num_states))
    sep = float(ham.mean()) if len(ham) else 0.0
    return float(w), sep, float(wd)


def evaluate_sweep_dir(sweep_dir: str | Path, store, splits, flags,
                       variant: str = "contrastive",
                       temperature: float = 0.2,
                       split: str = "val") -> List[TradeoffPoint]:
    """Re-evaluate every ``best_model_<run>`` checkpoint in a sweep dir.

    Reads the per-run ``<run>_config.json`` the sweep runner writes for the
    latent dim / noise ratio; skips runs whose checkpoint is missing.
    """
    from svtpu.config import rbvae_variant

    sweep_dir = Path(sweep_dir)
    idx = [i for s in splits.of(split) for i in s]
    frames = store.gather(np.asarray(idx))
    input_hw = tuple(store.item_shape[:2])
    in_ch = store.item_shape[2]
    points = []
    for cfg_file in sorted(sweep_dir.glob("*_config.json")):
        run = cfg_file.name[:-len("_config.json")]
        ckpt = sweep_dir / f"best_model_{run}"
        if not ckpt.exists():
            continue
        config = json.loads(cfg_file.read_text()).get("config", {})
        mcfg = rbvae_variant(variant, latent_dim=int(config["latent_dim"]),
                             input_hw=input_hw, in_channels=in_ch,
                             out_channels=in_ch)
        bundle = RBVAEBundle.from_checkpoint(str(ckpt), mcfg, name=run)
        w, sep, wd = evaluate_checkpoint(
            bundle, frames, idx, flags, temperature=temperature,
            noise_ratio=float(config.get("noise_ratio", 0.1)))
        points.append(TradeoffPoint(run, w, sep, wd, config))
    return points


def evaluate_standalone(name: str, ckpt_dir: str | Path, store, splits,
                        flags, variant: str = "contrastive",
                        latent_dim: int = 25, noise_ratio: float = 0.1,
                        which: str = "best", temperature: float = 0.2,
                        split: str = "val") -> TradeoffPoint:
    """One trade-off point from a standalone trainer checkpoint dir
    (``svtpu.cli train --save-path``), so hand-launched runs plot on the
    same chart as sweep trials."""
    from svtpu.config import rbvae_variant
    from svtpu.evaluation.common import RBVAEBundle

    idx = [i for s in splits.of(split) for i in s]
    frames = store.gather(np.asarray(idx))
    mcfg = rbvae_variant(variant, latent_dim=latent_dim,
                         input_hw=tuple(store.item_shape[:2]),
                         in_channels=store.item_shape[2],
                         out_channels=store.item_shape[2])
    bundle = RBVAEBundle.from_checkpoint(str(ckpt_dir), mcfg, which=which,
                                         name=name)
    w, sep, wd = evaluate_checkpoint(bundle, frames, idx, flags,
                                     temperature=temperature,
                                     noise_ratio=noise_ratio)
    meta_file = Path(ckpt_dir) / f"{which}.json"
    config = (json.loads(meta_file.read_text())
              if meta_file.exists() else {})
    config["latent_dim"] = latent_dim
    return TradeoffPoint(name, w, sep, wd, config)


def write_csv(points: Sequence[TradeoffPoint], path: str | Path):
    keys = sorted({k for p in points for k in p.config})
    lines = ["run,consistency,det_consistency,separation_bits,"
             + ",".join(keys)]
    for p in points:
        cfg = ",".join(str(p.config.get(k, "")) for k in keys)
        lines.append(f"{p.run},{p.consistency:.6f},{p.det_consistency:.6f},"
                     f"{p.separation:.4f},{cfg}")
    Path(path).write_text("\n".join(lines) + "\n")


def pareto_front(points: Sequence[TradeoffPoint]) -> List[TradeoffPoint]:
    """Points not dominated in (consistency, separation)."""
    front = []
    for p in points:
        if not any(q.consistency >= p.consistency
                   and q.separation >= p.separation and q is not p
                   and (q.consistency > p.consistency
                        or q.separation > p.separation)
                   for q in points):
            front.append(p)
    return sorted(front, key=lambda p: p.separation)


def plot_tradeoff(points: Sequence[TradeoffPoint], path: str | Path,
                  sep_target: Optional[float] = 3.0,
                  title: str = "Consistency vs deterministic separation"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    xs = [p.separation for p in points]
    ys = [p.consistency for p in points]
    ax.scatter(xs, ys, s=36, zorder=3)
    for p in points:
        ax.annotate(p.run.replace("local_", "t"), (p.separation,
                    p.consistency), fontsize=7,
                    xytext=(3, 3), textcoords="offset points")
    front = pareto_front(points)
    if len(front) > 1:
        ax.plot([p.separation for p in front],
                [p.consistency for p in front],
                "--", lw=1, zorder=2, label="pareto front")
    if sep_target is not None:
        ax.axvline(sep_target, color="gray", lw=0.8, ls=":",
                   label=f"sep target {sep_target:g} bits")
    ax.set_xlabel("deterministic adjacent-state separation (bits)")
    ax.set_ylabel("weighted state consistency (eval protocol)")
    ax.set_ylim(0, 1.05)
    ax.set_title(title)
    ax.legend(loc="lower left", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
