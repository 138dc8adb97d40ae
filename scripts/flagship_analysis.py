"""Flagship replication analysis (VERDICT r2 item 4).

Reads the per-epoch history JSONLs written by
``scripts/flagship_replication.sh`` (``--history-out``) plus the eval
CSVs, and produces:

  * the >=5-seed replication table (selection combined + held-out test
    mean +/- std across seeds);
  * the latent-25 late-training instability diagnosis: for each seed,
    the first erosion event (separation drops from a held >=3-bit level)
    with the temperature, KL and contrast terms at/around that epoch —
    the measurement that turns round 2's "noted but not diagnosed" into
    a mechanism statement.

Usage: python scripts/flagship_analysis.py [results/flagship_replication]
"""
import csv
import glob
import json
import os
import sys


def load_history(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def erosion_events(hist, hold=3.0, drop=0.5):
    """Epochs where separation falls below ``drop * running_max`` after
    having held >= ``hold`` bits."""
    events, run_max = [], 0.0
    for row in hist:
        sep = row.get("state_separation", 0.0)
        run_max = max(run_max, sep)
        if run_max >= hold and sep < drop * run_max:
            events.append((row["epoch"], sep, run_max,
                           row.get("temperature"),
                           row.get("kl_loss"), row.get("contrast_loss"),
                           row.get("total_loss")))
            run_max = sep  # re-arm: report each distinct collapse once
    return events


def summarize_seed(seed, hist, eval_dir):
    best = max(hist, key=lambda r: r.get("combined_score", 0.0))
    out = {"seed": seed,
           "best_combined": round(best.get("combined_score", 0.0), 4),
           "best_epoch": best["epoch"],
           "first_ge_090": next((r["epoch"] for r in hist
                                 if r.get("combined_score", 0) >= 0.90),
                                None),
           "final_sep": hist[-1].get("state_separation"),
           "erosion_events": [
               {"epoch": e, "sep": s, "from": m, "temp": t,
                "kl": k, "contrast": c, "total": tot}
               for e, s, m, t, k, c, tot in erosion_events(hist)]}
    csv_path = os.path.join(eval_dir, "consistency.csv")
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                if row.get("perturbation") == "clean":
                    out["test_clean_mean"] = round(float(row["mean"]), 4)
                    out["test_clean_std"] = round(float(row["std"]), 4)
    return out


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "results/flagship_replication"
    rows = []
    for path in sorted(glob.glob(os.path.join(base, "history_s*.jsonl"))):
        seed = os.path.basename(path)[len("history_s"):-len(".jsonl")]
        hist = load_history(path)
        if not hist:
            continue
        row = summarize_seed(seed, hist, os.path.join(base, f"eval_s{seed}"))
        # Arm = suffix after the seed number ("" for the base recipe,
        # "restart"/"floor"/"hardened" for the mitigation arms) so the
        # aggregate statistics never mix recipes.
        row["arm"] = seed.split("_", 1)[1] if "_" in seed else "base"
        rows.append(row)
    for r in rows:
        print(json.dumps(r))
    import numpy as np
    for arm in sorted({r["arm"] for r in rows}):
        arm_rows = [r for r in rows if r["arm"] == arm]
        tests = [r["test_clean_mean"] for r in arm_rows
                 if "test_clean_mean" in r]
        sels = [r["best_combined"] for r in arm_rows]
        print(json.dumps({
            "arm": arm,
            "n_seeds_here": len(arm_rows),
            "selection_combined_mean": round(float(np.mean(sels)), 4),
            "selection_combined_std": round(float(np.std(sels)), 4),
            "test_clean_mean": (round(float(np.mean(tests)), 4)
                                if tests else None),
            "test_clean_std": (round(float(np.std(tests)), 4)
                               if tests else None)}))


if __name__ == "__main__":
    main()
