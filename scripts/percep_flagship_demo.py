"""Percep-variant flagship demo at full production scale.

Trains the percep RBVAE (convs 256³ over [88,160,4] SD-latent-shaped
inputs, 4-layer LSTMs — ``percep_RBVAE_model.py:46-191`` geometry) with
the svtpu flagship objective (contrast_on="p" + context-free +
noise-hardened selection) on synthetic state-structured embeddings. No
real SD checkpoint is downloadable in this environment (zero egress), so
the embeddings are synthetic: per-state patterns + noise at the exact
tensor scale the real pipeline produces. This validates the percep model
family end-to-end at production scale under the round-2 objective.

Usage: python scripts/percep_flagship_demo.py [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
from svtpu.data.datasets import EmbeddingStore
from svtpu.data.segments import split_segments
from svtpu.training.trainer import Trainer


def synth_embeddings(meta: VideoMeta, seed=3):
    """Per-frame [1,4,88,160] embeddings: a state-specific low-frequency
    pattern + frame noise, roughly matching real SD-latent statistics
    (zero-mean, unit-ish scale)."""
    rng = np.random.default_rng(seed)
    n_states = meta.num_states
    bases = rng.normal(size=(n_states, 4, 88, 160)).astype(np.float32)
    from svtpu.data.segments import assign_label
    out = {}
    for i in range(meta.last_frame + 1):
        s = assign_label(i, meta.flags)
        out[f"{i:010d}.jpg"] = (bases[s]
                                + 0.35 * rng.normal(size=(4, 88, 160))
                                ).astype(np.float32)[None]
    return out


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    meta = VideoMeta("synth_percep", flags=(74, 206, 282, 389),
                     last_frame=479, grey_out=10)
    store = EmbeddingStore(synth_embeddings(meta))
    splits = split_segments(meta.state_segments(), 0.1, 0.1)
    mcfg = rbvae_variant("percep", latent_dim=25,
                         compute_dtype="bfloat16")
    tcfg = TrainConfig(
        batch_size=16, learning_rate=3e-4, init_temperature=2.0,
        final_temperature=0.2, anneal_rate=3e-4, num_steps_to_update=4,
        margin=3.5, alpha=4.0, beta_kl=0.2, noise_ratio=0.3,
        eval_noise_ratio=0.1, contrast_on="p", contextfree_contrast=True,
        select_by="combined", objective="contrastive")
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags, seed=1)
    print(f"staged={tr._bank is not None} "
          f"emb_bank_mb={store.array.nbytes / 2**20:.0f}")
    hist = tr.train(num_epochs=epochs,
                    save_path="data/ckpt/percep_flagship", resume=True)
    best = max(v.get("combined_score", 0.0) for v in hist["val_losses"])
    last = hist["val_losses"][-1]
    print(f"best_combined={best:.4f} "
          f"final cons={last['consistency_score']:.3f} "
          f"det={last['det_consistency_score']:.3f} "
          f"sep={last['state_separation']:.2f}")


if __name__ == "__main__":
    main()
