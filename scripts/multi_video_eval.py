"""Held-out test evaluation of a multi-video diagnose arm.

The diagnose probes (`multi_video_diagnose.py`) score VAL frames; this
script runs the standard 10-trial held-out protocol (clean / gaussian
noise / occlusion, temp 0.2, hard=True, noise_ratio 0.1 — reference
``embedding_matching.py:400-416``) on the TEST split of the combined
two-video dataset, using the GLOBAL state labels from
``combine_videos`` (the reference cannot express this eval: it trains
and evaluates strictly one video per run).

Also reports the deterministic adjacent-Hamming vector over the global
state axis (8 pairs; indices 0-3 = chinchess in-video, 4 = cross-video
boundary, 5-7 = synth in-video) for both the best and latest
checkpoints.

Usage: python scripts/multi_video_eval.py [arm] [ckpt ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from multi_video_diagnose import ARMS, build  # noqa: E402
from svtpu.config import rbvae_variant
from svtpu.evaluation.common import RBVAEBundle
from svtpu.evaluation.consistency import evaluate_consistency, write_csv
from svtpu.evaluation.hamming import adjacent_hamming, modal_codes


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "beta_low"
    whichs = sys.argv[2:] or ["best", "latest"]
    spec = dict(ARMS[arm])
    # Strip run_single()'s orchestration keys; apply phase-2 config
    # overrides (the store/splits the eval needs are unaffected either
    # way, but TrainConfig would reject unknown keys).
    spec.pop("_seed", None)
    spec.pop("_phase2_at", None)
    spec.update(spec.pop("_phase2", {}) or {})
    tr = build(spec)
    ckpt_dir = f"data/ckpt/multi_diag_{arm}"
    out_dir = f"results/multi_diagnose/eval_{arm}"
    os.makedirs(out_dir, exist_ok=True)

    test_idx = [i for s in tr.splits.test for i in s]
    frames01 = tr.store.gather(np.asarray(test_idx)).astype(np.float32) / 255.0
    labels = [tr.labels_by_index[i] for i in test_idx]
    num_states = int(max(tr.labels_by_index.values())) + 1
    cfg = rbvae_variant("contrastive", latent_dim=25,
                        compute_dtype="bfloat16")

    summary = {"arm": arm, "num_test_frames": len(test_idx),
               "num_states": num_states}
    all_results = []
    for which in whichs:
        bundle = RBVAEBundle.from_checkpoint(
            ckpt_dir, cfg, which=which, name=f"{arm}_{which}")
        # Deterministic separation: hard codes, no noise.
        det_codes = bundle.encode(frames01, temperature=0.2, hard=True,
                                  noise=False)
        ham = adjacent_hamming(
            modal_codes(det_codes, np.asarray(labels), num_states))
        res = evaluate_consistency(
            bundle, frames01, test_idx, flags=[], num_trials=10,
            labels=labels)
        all_results.extend(res)
        summary[which] = {
            "ham_vector": [int(x) for x in ham],
            "min_sep": int(min(ham)),
            "mean_sep": round(float(np.mean(ham)), 2),
            **{r.perturbation: {"mean": round(r.mean, 4),
                                "std": round(r.std, 4)} for r in res},
        }
        print(json.dumps({which: summary[which]}), flush=True)

    write_csv(all_results, os.path.join(out_dir, "consistency.csv"))
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
