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
    # ---- round-5 arms (VERDICT r4 item 3). A data correction first:
    # the hardened arm's 0.95 floor only BINDS from ~epoch 1250 (anneal
    # 3e-4 from T=2), so hardened == beta_low byte-identically through
    # the entire basin-decision window — chinchess pair 3 separates at
    # epochs 350-400 in both. The early pair-3 basin therefore
    # correlates with the BRAKE being armed from epoch 0 (the only
    # early-dynamics difference in the two failing arms), not with the
    # floor's "sustained-noise phase". These arms test that reading.
    #
    # brake_defer: phase 1 (epochs 0-600) = beta_low verbatim — no
    # brake, full anneal toward 0.2 — so the basin decides exactly as in
    # the winning arms; phase 2 (600-1500) arms the brake (l1 0.1) to
    # prevent the LATE |h|/T trap that killed beta_low at epochs
    # 1300-1350 (temp 0.89-0.92), while the anneal continues toward the
    # cold-eval-matched operating point (temp reaches ~0.82 by 1500).
    # Prediction: pair 3 separates by ~400, no trap fires, delivered
    # checkpoint beats hardened's 0.871/min-12 at a colder temperature.
    "brake_defer": {"beta_kl": 0.05, "sep_aggregate": "min",
                    "_phase2_at": 600, "_phase2": {"l1_logits": 0.1}},
    # hardened_s2: the shipping recipe on a second seed (the n=1-seed
    # weakness called out by the r4 verdict).
    "hardened_s2": {"beta_kl": 0.05, "final_temperature": 0.95,
                    "sep_aggregate": "min", "_seed": 2},
    # braked_minrestart: the round-4 min-basin check pointed at the
    # multi-video failure. Calibration note recorded BEFORE running: the
    # VERDICT's literal "check at 250" would FALSE-FIRE even on the
    # winning arms (hardened/beta_low min-pair is 0 until pair 3
    # separates at 350-400), so the check sits at 450, where the
    # winning arms read min-pair >=12 and both brake arms read 0.
    # Prediction: fires at 450 on every braked leg if the brake causes
    # the basin across inits; a leg that escapes would instead rescue
    # the cold-anneal brake recipe.
    "braked_minrestart": {"beta_kl": 0.05, "l1_logits": 0.1,
                          "sep_aggregate": "min",
                          "restart_check_epoch": 450,
                          "restart_min_sep": 3.0, "restart_on": "min",
                          "max_restarts": 3},
}

# Arms run as ONE tr.train() call (not 50-epoch chunks): the restart
# machinery counts epochs from each call's start_epoch, and the round-4
# per-pair history columns (sep_pair_i/sep_min) supersede the chunked
# ham_vector probes anyway. Full per-epoch history goes to the jsonl.
SINGLE_CALL_ARMS = {"brake_defer", "hardened_s2", "braked_minrestart"}


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


def run_single(arm, total):
    """One-call training for the round-5 arms: full per-epoch history
    (incl. the round-4 ``sep_pair_i``/``sep_min`` columns), optional
    two-phase config (``_phase2``/``_phase2_at``: rebuild the trainer
    with overrides and resume the same checkpoint), working restarts."""
    spec = dict(ARMS[arm])
    seed = spec.pop("_seed", 1)
    phase2 = spec.pop("_phase2", None)
    phase2_at = spec.pop("_phase2_at", None)
    ckpt_dir = f"data/ckpt/multi_diag_{arm}"
    out_path = f"results/multi_diagnose/{arm}.jsonl"
    phases = [(spec, min(phase2_at, total) if phase2 is not None
               else total)]
    if phase2 is not None and total > phase2_at:
        phases.append(({**spec, **phase2}, total))
    os.makedirs("results/multi_diagnose", exist_ok=True)
    mode = "a" if os.path.exists(out_path) else "w"
    with open(out_path, mode) as f:
        for pspec, end in phases:
            tr = build(pspec, seed=seed)
            nb = sum(1 for _ in (tr.train_batcher.epoch_indices(0)
                                 if tr._bank is not None
                                 else tr.train_batcher.epoch(0)))
            hist = tr.train(num_epochs=end, save_path=ckpt_dir,
                            resume=True)
            n = len(hist["val_losses"])
            first = end - n
            for i, (t, v) in enumerate(zip(hist["train_losses"],
                                           hist["val_losses"])):
                ep = first + i
                step = (ep + 1) * nb
                temp = float(temperature_schedule(
                    np.asarray(step), tr.cfg.init_temperature,
                    tr.cfg.final_temperature, tr.cfg.anneal_rate,
                    tr.cfg.num_steps_to_update))
                f.write(json.dumps(
                    {"arm": arm, "epoch": ep,
                     "temperature": round(temp, 4),
                     **{k: round(float(x), 5) for k, x in t.items()},
                     **{k: round(float(x), 5) for k, x in v.items()}})
                    + "\n")
            for r in hist.get("restarts", []):
                f.write(json.dumps({"arm": arm, "restart": r}) + "\n")
            f.flush()
            last = hist["val_losses"][-1] if hist["val_losses"] else {}
            print(json.dumps(
                {"arm": arm, "phase_end": end,
                 "best_epoch": hist["best_epoch"],
                 "best_metric": round(float(hist["best_metric"]), 4),
                 "restarts": hist.get("restarts", []),
                 "last": {k: round(float(x), 4) for k, x in last.items()
                          if k in ("consistency_score",
                                   "det_consistency_score",
                                   "state_separation", "sep_min",
                                   "sep_mean", "combined_score")}}),
                flush=True)


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    arms = sys.argv[2:] or list(ARMS)
    os.makedirs("results/multi_diagnose", exist_ok=True)
    for arm in arms:
        if arm in SINGLE_CALL_ARMS:
            run_single(arm, total)
            continue
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
