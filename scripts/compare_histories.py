"""Compare two per-epoch history JSONL files (CLI ``--history-out``
format) for numeric equivalence — the fused-epoch hardware gate
(VERDICT r4 item 1): a short flagship run fused vs ``--no-fused-epoch``
with the same seed must match row-for-row to float-accumulation noise
(the scan body IS the per-step function; only the metric REDUCTION
differs — f32 on-device sums vs f64 host sums, DESIGN.md §8).

Usage: python scripts/compare_histories.py A.jsonl B.jsonl [rtol]
Exits nonzero (and prints ok=false) when any shared numeric field
differs by more than rtol relative (default 2e-3 — generous for bf16
compute divergence compounding over epochs; the probe metrics
themselves are modal-count ratios and should match exactly).
"""
import json
import sys

def main():
    a, b = sys.argv[1], sys.argv[2]
    rtol = float(sys.argv[3]) if len(sys.argv) > 3 else 2e-3
    ra = [r for r in (json.loads(l) for l in open(a)) if "epoch" in r]
    rb = [r for r in (json.loads(l) for l in open(b)) if "epoch" in r]
    worst = (0.0, None, None)
    n = min(len(ra), len(rb))
    for i in range(n):
        x, y = ra[i], rb[i]
        for k in set(x) & set(y):
            if not isinstance(x[k], (int, float)) \
                    or not isinstance(y[k], (int, float)):
                continue
            d = abs(x[k] - y[k]) / max(abs(x[k]), abs(y[k]), 1e-9)
            if d > worst[0]:
                worst = (d, i, k)
    ok = worst[0] <= rtol and len(ra) == len(rb)
    print(json.dumps({"rows": [len(ra), len(rb)],
                      "worst_rel_diff": round(worst[0], 8),
                      "at_epoch": worst[1], "key": worst[2],
                      "rtol": rtol, "ok": ok}))
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
