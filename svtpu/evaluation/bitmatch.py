"""Symbol bit-match fidelity vs reference checkpoints.

The driver's fidelity metric (BASELINE.json: "symbol bit-match % vs
reference, within straight-through tolerance"). Protocol (SURVEY.md §7
"stochasticity parity"): in deterministic mode (no Binary-Concrete noise)
the hard codes from a ported reference checkpoint must match the torch
model's exactly; stochastic mode only matches distributionally, so fidelity
is always measured with noise off.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from svtpu.config import RBVAEConfig
from svtpu.evaluation.common import RBVAEBundle


def bit_match(codes_a: np.ndarray, codes_b: np.ndarray) -> Dict[str, float]:
    """Compare two ``[N, L]`` hard code arrays.

    Returns per-bit match % and exact whole-code match %.
    """
    a = np.asarray(codes_a) > 0.5
    b = np.asarray(codes_b) > 0.5
    assert a.shape == b.shape, (a.shape, b.shape)
    per_bit = float(np.mean(a == b))
    exact = float(np.mean(np.all(a == b, axis=-1)))
    return {"bit_match_pct": 100.0 * per_bit,
            "exact_code_match_pct": 100.0 * exact,
            "n_frames": int(a.shape[0]), "latent_dim": int(a.shape[1])}


def codes_from_torch_checkpoint(state_dict, cfg: RBVAEConfig,
                                frames: np.ndarray,
                                temperature: float = 0.2) -> np.ndarray:
    """Port a reference checkpoint and encode frames deterministically."""
    from svtpu.models.convert_rbvae import convert_rbvae

    params = convert_rbvae(state_dict, cfg)
    bundle = RBVAEBundle(cfg=cfg, params=params, name="ported")
    return bundle.encode(frames, temperature=temperature, hard=True,
                         noise=False)
