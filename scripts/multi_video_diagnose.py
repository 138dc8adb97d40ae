"""Multi-video separation-erosion diagnosis (VERDICT r2 item 10).

Round 2's two-video run collapsed abruptly (~epoch 550): mean adjacent
Hamming separation 6.0 -> 0.0 in one 50-epoch window while det
consistency stayed 1.0 and the train loss JUMPED 40 -> 45 (the
dissimilar hinge re-engaging on merged codes).  This script captures the
transition and tests one mechanism-driven fix:

  * chunked training (probe every CHUNK epochs) logging, per probe:
    the full adjacent-Hamming VECTOR (which state pair merges first —
    in particular the cross-video boundary pair vs in-video pairs),
    context-free logit scale |h|, the current annealed temperature, and
    the standard val metrics;
  * arms: ``control`` (the round-2 config verbatim) and ``beta_low``
    (beta_kl 0.2 -> 0.05) — the KL term pulls every bit toward
    bernoulli_p=0.1 and is the one loss whose basin is "all states on
    one code"; if the collapse is a KL-dominance flip as the sampling
    gradient weakens near the temperature floor, weakening KL should
    remove or delay it.

Results go to results/multi_diagnose/<arm>.jsonl.

Usage: python scripts/multi_video_diagnose.py [total_epochs] [arm ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from multi_video_demo import synth_video  # noqa: E402
from svtpu.config import BUILTIN_VIDEOS, TrainConfig, rbvae_variant
from svtpu.data.datasets import FrameStore
from svtpu.data.multi import combine_videos
from svtpu.evaluation.hamming import adjacent_hamming, modal_codes
from svtpu.training.schedules import temperature_schedule
from svtpu.training.trainer import Trainer, _prep

CHUNK = 50

ARMS = {
    "control": {},
    "beta_low": {"beta_kl": 0.05},
    # The hinge is mean-reduced over adjacent state pairs (faithful to the
    # reference's torch mean reduction, ops/losses.py:86), so 9 global
    # states (8 pairs) halve the per-pair dissimilar gradient vs the
    # single-video flagship (5 states, 4 pairs) while the KL pull per bit
    # is unchanged.  alpha 4 -> 8 restores the single-video per-pair
    # pressure exactly.
    # sep_aggregate="min" (selection-only; no effect on dynamics) so the
    # arm's combined_score reflects the weakest pair — mean aggregation
    # scored the control arm 0.58+ while chinchess was fully merged.
    "alpha_scaled": {"alpha": 8.0, "sep_aggregate": "min"},
    # The mechanism-informed multi-video recipe, all three measured fixes
    # together: beta_low (basin escape — the 700-epoch A/B), an anneal
    # floor ABOVE this run's measured trap temperature (the extended
    # beta_low run eroded between epochs 1300-1350 at temp 0.89-0.92 —
    # consistent with |h|/T saturation at its larger logit scale 0.174),
    # and min-aggregated selection (the mean-aggregated combined score
    # rebounded to 0.93 AFTER the collapse, i.e. selection was blind to
    # losing the real video).
    "hardened": {"beta_kl": 0.05, "final_temperature": 0.95,
                 "sep_aggregate": "min"},
    # The mechanism-rooted alternative to the 0.95 floor: the L1 logit
    # brake (single-video queue10/13 result) bounds the |h| growth that
    # causes the |h|/T trap, so the anneal can run all the way to 0.2 —
    # a colder operating point that, on the single-video path, beats
    # warm-floor arms on held-out consistency. Same beta_low + min
    # aggregation as "hardened"; only the trap fix differs.
    "braked": {"beta_kl": 0.05, "l1_logits": 0.1,
               "sep_aggregate": "min"},
    # Round-4 recovery arm (VERDICT r3 item 4): the braked arm showed the
    # brake alone cannot exit a per-video basin (chinchess pair 3 pinned
    # at 0 bits for all 1500 epochs while |h| sat at 0.17) — the trap it
    # fixes is |h|/T saturation, not basin escape. Combine the brake with
    # a MODERATE floor (0.55, the single-video v1 value — well below the
    # hardened arm's 0.95) to test whether keeping the sampling gradient
    # warm enough for basin escape while operating much colder than 0.95
    # beats the hardened recipe's 0.871/min-12.
    "brake_floor": {"beta_kl": 0.05, "l1_logits": 0.1,
                    "final_temperature": 0.55, "sep_aggregate": "min"},
}


def build(arm_overrides, seed=1):
    chin = BUILTIN_VIDEOS["chinese_chess"]
    store_a = FrameStore("data/frames/chinese_chess",
                         list(range(chin.last_frame + 1)),
                         resolution=(256, 256))
    store_b, meta_b = synth_video()
    store, splits, labels = combine_videos([(store_a, chin),
                                            (store_b, meta_b)])
    mcfg = rbvae_variant("contrastive", latent_dim=25,
                         compute_dtype="bfloat16")
    tkw = dict(
        batch_size=32, learning_rate=3e-4, init_temperature=2.0,
        final_temperature=0.2, anneal_rate=3e-4, num_steps_to_update=4,
        margin=3.5, alpha=4.0, beta_kl=0.2, noise_ratio=0.3,
        eval_noise_ratio=0.1, contrast_on="p", contextfree_contrast=True,
        select_by="combined", objective="contrastive")
    tkw.update(arm_overrides)
    tr = Trainer(mcfg, TrainConfig(**tkw), store, splits, flags=[],
                 seed=seed, labels_by_index=labels)
    return tr


def probe(tr, params, epoch):
    """Adjacent-Hamming vector + logit scale on the val frames."""
    val_idx = [i for s in tr.splits.val for i in s]
    codes = tr._val_codes(params, val_idx, tr.cfg.final_temperature,
                          noise=False, seed=epoch)
    labels = np.asarray([tr.labels_by_index[i] for i in val_idx])
    num_states = int(max(tr.labels_by_index.values())) + 1
    ham = adjacent_hamming(modal_codes(codes, labels, num_states))
    # Context-free logit scale on a val probe (the quantity whose decay
    # marks the KL pull toward the collapsed basin).
    rows = tr.store.rows(np.asarray(val_idx[:64])).astype(np.int32)
    model = tr.model

    @jax.jit
    def h_of(p, r):
        x = _prep(tr._bank[r])[:, None]
        out = model.apply(p, x, 1.0, False, 0.0, deterministic=True)
        return out.h_seq[:, 0]

    h = np.asarray(h_of(params, jnp.asarray(rows)))
    return {"ham_vector": [int(x) for x in ham],
            "abs_h_mean": round(float(np.abs(h).mean()), 4)}


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    arms = sys.argv[2:] or list(ARMS)
    os.makedirs("results/multi_diagnose", exist_ok=True)
    for arm in arms:
        tr = build(dict(ARMS[arm]))
        ckpt_dir = f"data/ckpt/multi_diag_{arm}"
        out_path = f"results/multi_diagnose/{arm}.jsonl"
        # steps/epoch for the temperature axis
        nb = sum(1 for _ in (tr.train_batcher.epoch_indices(0)
                             if tr._bank is not None
                             else tr.train_batcher.epoch(0)))
        mode = "a" if os.path.exists(out_path) else "w"
        with open(out_path, mode) as f:
            for end in range(CHUNK, total + 1, CHUNK):
                hist = tr.train(num_epochs=end, save_path=ckpt_dir,
                                resume=True)
                if not hist["val_losses"]:      # chunk already trained
                    continue
                last = hist["val_losses"][-1]
                step = end * nb
                temp = float(temperature_schedule(
                    np.asarray(step), tr.cfg.init_temperature,
                    tr.cfg.final_temperature, tr.cfg.anneal_rate,
                    tr.cfg.num_steps_to_update))
                params = hist["final_state"].params
                row = {"arm": arm, "epoch": end, "temperature": round(temp, 4),
                       **probe(tr, params, end),
                       **{k: round(float(last[k]), 4) for k in
                          ("consistency_score", "det_consistency_score",
                           "state_separation", "combined_score",
                           "total_loss", "kl_loss", "contrast_loss",
                           "recon_loss") if k in last},
                       "train_total": round(float(
                           hist["train_losses"][-1]["total_loss"]), 4)}
                f.write(json.dumps(row) + "\n")
                f.flush()
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
