"""Round-5 min-basin-check decision table (VERDICT r4 item 2).

For each seed with a ``--restart-on min --restart-min-sep 3`` arm,
report: whether/when the check fired, run-max min-pair by the check
epoch per leg, the delivered checkpoint's held-out clean + Hamming
vector, and the plain-v2 baseline row — the table the preset-v3
decision rule (pre-registered in results/r5_predictions.md) consumes.

Usage: python scripts/r5_minbasin_analysis.py [seed ...]
"""
import json
import os
import sys

OUT = "results/flagship_replication"

# v2 baselines (RESULTS.md "Preset v2 measured" + committed evals).
V2 = {
    3: {"clean": 0.964, "ham": [22, 24, 22, 20]},
    5: {"clean": 0.764, "ham": [19, 18, 17, 4]},
    6: {"clean": 0.851, "ham": [22, 21, 21, 18]},
    7: {"clean": 0.872, "ham": [20, 23, 23, 1]},
    8: {"clean": 0.923, "ham": [21, 20, 21, 1]},
}


def summarize(seed):
    name = f"s{seed}_v2minrestart"
    hist_path = f"{OUT}/history_{name}.jsonl"
    if not os.path.exists(hist_path):
        return {"seed": seed, "status": "missing"}
    all_rows = [json.loads(l) for l in open(hist_path)]
    rows = [r for r in all_rows if "epoch" in r]
    meta = next((r["meta"] for r in all_rows if "meta" in r), {})
    restarts = meta.get("restarts", [])
    # Run-max min-pair inside each (re)start window, read at the epochs
    # the basin check fires (250 epochs after each (re)start; restart
    # events come from the history's trailing meta row).
    starts = [0] + [r["epoch"] + 1 for r in restarts]
    checks = []
    run_max, si = 0.0, 0
    for i, r in enumerate(rows):
        if si < len(restarts) and i == restarts[si]["epoch"] + 1:
            run_max, si = 0.0, si + 1
        run_max = max(run_max, r.get("sep_min", 0.0))
        if i + 1 - starts[si] == 250:
            checks.append({"epoch": i, "leg": si,
                           "run_max_min_pair": run_max})
    ev = {}
    p = f"{OUT}/eval_{name}/consistency.csv"
    if os.path.exists(p):
        for l in open(p).read().splitlines()[1:]:
            _, pert, mean, std = l.split(",")
            ev[pert] = f"{float(mean):.4f} ± {float(std):.4f}"
    ham = []
    hp = f"{OUT}/eval_{name}/hamming.csv"
    if os.path.exists(hp):
        ham = [int(l.strip().rsplit(",", 1)[-1])
               for l in open(hp).read().splitlines()[1:]]
    best = max(rows, key=lambda r: (r.get("combined_score", 0),
                                    r.get("det_consistency_score", 0)))
    return {"seed": seed, "rows": len(rows),
            "restarts": restarts, "check_windows": checks,
            "best_combined": round(best.get("combined_score", 0), 4),
            "eval": ev or None, "eval_ham": ham,
            "v2_baseline": V2.get(seed)}


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [3, 5, 6, 8]
    for s in seeds:
        print(json.dumps(summarize(s)))


if __name__ == "__main__":
    main()
