"""Percep-collapse mechanism diagnosis (VERDICT r2 item 2).

Round 2's percep flagship run collapsed from epoch 0 (det consistency 1.0,
separation 0, stochastic consistency pinned at the 5/39 floor, train loss
only tracking the recon floor). This script instruments the failure:

  * probes the encoder-LSTM logit statistics (mean |h|, std) at init and
    after training — the collapse signature (det 1.0 + stochastic floor)
    means logits sit so close to 0 that the 0.1-noise eval draws random
    codes while the deterministic signs are all identical;
  * runs one-factor ablations of the flagship percep config (KL off,
    noise down, lr up, 2-layer LSTMs, linear decoder head), each a short
    horizon on hardware, logging per-term losses + logit scale + the
    consistency/separation metrics.

Usage: python scripts/percep_diagnose.py [epochs] [which ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
from svtpu.data.datasets import EmbeddingStore
from svtpu.data.segments import assign_label, split_segments
from svtpu.training.trainer import Trainer

from percep_flagship_demo import synth_embeddings  # noqa: E402


def logit_stats(trainer, params, n=64):
    """Mean |h|, h std, and inter-state p-distance on a probe of val
    frames encoded context-free (T=1), the representation the metrics
    measure."""
    idx = [i for s in trainer.splits.val for i in s][:n]
    frames = trainer.store.gather(np.asarray(idx)).astype(np.float32)
    model = trainer.model

    @jax.jit
    def probe(p, x):
        out = model.apply(p, x[:, None], 1.0, False, 0.0,
                          deterministic=True)
        return out.h_seq[:, 0]

    h = np.asarray(probe(params, jnp.asarray(frames)))
    labels = np.asarray([assign_label(i, trainer.flags) for i in idx])
    p = 1.0 / (1.0 + np.exp(-h))
    cents = np.stack([p[labels == s].mean(0)
                      for s in sorted(set(labels.tolist()))])
    dists = [float(np.linalg.norm(cents[i] - cents[i + 1]))
             for i in range(len(cents) - 1)]
    return {"abs_h_mean": float(np.abs(h).mean()),
            "h_std": float(h.std()),
            "p_interstate_dist": round(float(np.mean(dists)), 4)}


ABLATIONS = {
    # one factor at a time vs the round-2 flagship percep config
    "control": {},
    "kl_off": {"beta_kl": 0.0},
    "noise_low": {"noise_ratio": 0.05, "eval_noise_ratio": 0.05},
    "lr_hi": {"learning_rate": 1e-3},
    "lstm2": {"_model": {"lstm_layers": 2}},
    "nosig": {"_model": {"decoder_sigmoid": False}},
    "anneal_fast": {"anneal_rate": 1e-3},
    # Localization: the PIXEL-variant trunk (64-ch convs, 2-layer LSTM —
    # the geometry the flagship recipe demonstrably works on) applied to
    # the same embeddings. If this separates where the percep geometry
    # collapses, the mechanism lives in the 256³-conv/4-layer-LSTM
    # statistics, not in the data or the objective.
    "pixelgeom": {"_variant": "contrastive"},
}


def run_one(tag, overrides, store, meta, epochs):
    mkw = dict(overrides.pop("_model", {}))
    variant = overrides.pop("_variant", "percep")
    if variant != "percep":
        mkw.update(input_hw=(88, 160), in_channels=4, out_channels=4)
    splits = split_segments(meta.state_segments(), 0.1, 0.1)
    mcfg = rbvae_variant(variant, latent_dim=25,
                         compute_dtype="bfloat16", **mkw)
    tkw = dict(
        batch_size=16, learning_rate=3e-4, init_temperature=2.0,
        final_temperature=0.2, anneal_rate=3e-4, num_steps_to_update=4,
        margin=3.5, alpha=4.0, beta_kl=0.2, noise_ratio=0.3,
        eval_noise_ratio=0.1, contrast_on="p", contextfree_contrast=True,
        select_by="combined", objective="contrastive")
    tkw.update(overrides)
    tr = Trainer(mcfg, TrainConfig(**tkw), store, splits, meta.flags, seed=1)
    state = tr.init_state()
    print(json.dumps({"tag": tag, "phase": "init",
                      **logit_stats(tr, state.params)}), flush=True)
    t0 = time.time()
    hist = tr.train(num_epochs=epochs)
    best = max(v.get("combined_score", 0.0) for v in hist["val_losses"])
    last_t = hist["train_losses"][-1]
    last_v = hist["val_losses"][-1]
    print(json.dumps({"tag": tag, "phase": "trained",
                      **logit_stats(tr, hist["final_state"].params)}),
          flush=True)
    print(json.dumps({
        "tag": tag, "phase": "done", "epochs": epochs,
        "sec": round(time.time() - t0, 1),
        "best_combined": round(best, 4),
        "final": {k: round(float(last_v[k]), 4) for k in
                  ("consistency_score", "det_consistency_score",
                   "state_separation")},
        "train_terms": {k: round(float(last_t[k]), 4) for k in last_t},
    }), flush=True)
    return hist


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    which = sys.argv[2:] or list(ABLATIONS)
    meta = VideoMeta("synth_percep", flags=(74, 206, 282, 389),
                     last_frame=479, grey_out=10)
    store = EmbeddingStore(synth_embeddings(meta))
    for tag in which:
        run_one(tag, dict(ABLATIONS[tag]), store, meta, epochs)


if __name__ == "__main__":
    main()
