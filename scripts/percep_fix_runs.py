"""Percep-variant fix runs (VERDICT r2 item 2, round-3 closure).

``percep_diagnose.py`` localized the round-2 percep collapse: with the
reference's 4-layer LSTMs (``percep_RBVAE_model.py:98,111``) the
binarization logits start at |h| ~= 0.013 and the flagship lr (3e-4)
cannot grow them — det consistency pins at 1.0 on ONE code with zero
separation. Halving LSTM depth (2 layers) separates 24/25 bits within
200 epochs; raising lr to 1e-3 (inside the reference sweep's own
1e-5..1e-2 range, ``percep_RBVAE_wandb_sweep.py:171``) starts to move
the 4-layer logits.

This script runs the two mechanism-confirming configurations to full
horizon with checkpoints + per-epoch history:

  * ``lstm2_full``  — percep geometry, 2-layer LSTMs, flagship recipe,
    1000 epochs. The positive-number candidate.
  * ``ref4_lr1e3``  — the reference 4-layer geometry with lr 1e-3,
    750 epochs (the reference sweep's horizon). Tests whether depth is
    fatal or merely slow at the right lr.

Usage: python scripts/percep_fix_runs.py [tag[@seed] ...]

``tag@N`` runs the same configuration with trainer seed N (run name,
checkpoint and history become ``<tag>_sN``) — the round-5 seed
replication of the residual fix (VERDICT r4 item 4: the 0.987 headline
was one seed, and the repo's own 10-seed study is the argument that one
seed is not enough). Plain ``tag`` keeps the round-3 behavior (seed 1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
from svtpu.data.datasets import EmbeddingStore
from svtpu.data.segments import split_segments
from svtpu.training.trainer import Trainer

from percep_flagship_demo import synth_embeddings  # noqa: E402

RUNS = {
    "lstm2_full": {"epochs": 1000, "_model": {"lstm_layers": 2}},
    "ref4_lr1e3": {"epochs": 750, "learning_rate": 1e-3},
    # Framework-level fix: keep the reference 4-layer geometry but give the
    # stack an identity path (svtpu ``lstm_residual``) — tests whether the
    # diagnosed depth-starvation is curable without changing depth or lr.
    "ref4_residual": {"epochs": 750, "_model": {"lstm_residual": True}},
}


def main():
    tags = sys.argv[1:] or list(RUNS)
    meta = VideoMeta("synth_percep", flags=(74, 206, 282, 389),
                     last_frame=479, grey_out=10)
    store = EmbeddingStore(synth_embeddings(meta))
    splits = split_segments(meta.state_segments(), 0.1, 0.1)
    os.makedirs("results/percep_fix", exist_ok=True)
    for tag in tags:
        tag, _, seed_s = tag.partition("@")
        seed = int(seed_s) if seed_s else 1
        name = f"{tag}_s{seed}" if seed_s else tag
        spec = dict(RUNS[tag])
        # Wall-clock trim hook: EPOCHS_<tag> env caps the horizon; the
        # trainer resumes, so a later longer run extends the same ckpt.
        epochs = int(os.environ.get(f"EPOCHS_{tag}", spec.pop("epochs")))
        spec.pop("epochs", None)
        mkw = spec.pop("_model", {})
        mcfg = rbvae_variant("percep", latent_dim=25,
                             compute_dtype="bfloat16", **mkw)
        tkw = dict(
            batch_size=16, learning_rate=3e-4, init_temperature=2.0,
            final_temperature=0.2, anneal_rate=3e-4,
            num_steps_to_update=4, margin=3.5, alpha=4.0, beta_kl=0.2,
            noise_ratio=0.3, eval_noise_ratio=0.1, contrast_on="p",
            contextfree_contrast=True, select_by="combined",
            objective="contrastive")
        tkw.update(spec)
        tr = Trainer(mcfg, TrainConfig(**tkw), store, splits, meta.flags,
                     seed=seed)
        t0 = time.time()
        hist = tr.train(num_epochs=epochs,
                        save_path=f"data/ckpt/percep_{name}", resume=True)
        with open(f"results/percep_fix/{name}.jsonl", "w") as f:
            for ep, (t, v) in enumerate(zip(hist["train_losses"],
                                            hist["val_losses"])):
                f.write(json.dumps({"epoch": ep,
                                    **{k: round(float(x), 5)
                                       for k, x in t.items()},
                                    **{k: round(float(x), 5)
                                       for k, x in v.items()}}) + "\n")
        best = max(hist["val_losses"],
                   key=lambda v: v.get("combined_score", 0.0))
        last = hist["val_losses"][-1]
        print(json.dumps({
            "tag": name, "seed": seed, "epochs": epochs,
            "sec": round(time.time() - t0, 1),
            "best_combined": round(float(best.get("combined_score", 0)), 4),
            "best": {k: round(float(best[k]), 4) for k in
                     ("consistency_score", "det_consistency_score",
                      "state_separation") if k in best},
            "final": {k: round(float(last[k]), 4) for k in
                      ("consistency_score", "det_consistency_score",
                       "state_separation") if k in last},
        }), flush=True)


if __name__ == "__main__":
    main()
