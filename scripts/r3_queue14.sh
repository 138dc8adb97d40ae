#!/bin/bash
# Preset v2 on the remaining replication seeds (RESULTS.md
# "Preset v2 measured", QUEUE14_PENDING marker): seeds 3-7 complete the
# 10-seed table. Seed 5 runs first — it is the basin-failure seed
# (queue4: sep never rises, restart converts it), i.e. the one arm that
# exercises preset v2's strict-restart leg; 3/4 are the erosion seeds,
# 6/7 the healthy ones (measuring the brake's tax on strong inits).
# Same flags as r3_queue13.sh; identical compiled shapes (cache hit).
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

# ADVICE r3: evals gate on the train stage's exit status (PIPESTATUS —
# '| tail' otherwise hides failures), and the rerun-skip checks a
# done-sentinel written only after eval-hamming succeeds (previously a
# crashed train could still produce consistency.csv and the arm would be
# permanently skipped with under-trained numbers).
run_arm() {  # name seed
  local NAME=$1 SEED=$2; shift 2
  if [ -f "results/flagship_replication/eval_${NAME}/done.sentinel" ] \
     || [ -f "results/flagship_replication/eval_${NAME}/consistency.csv" ]; then
    # (consistency.csv kept as a legacy marker so completed queue13/14
    # arms are not re-run; new arms write the sentinel.)
    return
  fi
  stage "flagship_${NAME}"
  SVTPU_EPOCH_LOG=100 python -u -m svtpu.cli train \
    --variant contrastive --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 1000 --batch-size 32 --lr 3e-4 \
    --init-temp 2.0 --final-temp 0.2 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --contrast-on p --contextfree-contrast --margin 3.5 \
    --noise-ratio 0.3 --eval-noise-ratio 0.1 --beta-kl 0.2 --alpha 4.0 \
    --select-by combined --seed "$SEED" \
    --l1-logits 0.1 \
    --restart-check-epoch 250 --restart-min-sep 10 --max-restarts 3 \
    "$@" \
    --save-path "data/ckpt/flagship_${NAME}" --resume \
    --history-out "results/flagship_replication/history_${NAME}.jsonl" \
    2>&1 | tail -6
  [ "${PIPESTATUS[0]}" -eq 0 ] \
    || { echo "=== flagship_${NAME} train FAILED"; return 1; }
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "results/flagship_replication/eval_${NAME}" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] \
    || { echo "=== flagship_${NAME} eval-consistency FAILED"; return 1; }
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "results/flagship_replication/eval_${NAME}" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] \
    || { echo "=== flagship_${NAME} eval-hamming FAILED"; return 1; }
  touch "results/flagship_replication/eval_${NAME}/done.sentinel"
}

FAILED=0
run_arm s5_v2 5 || FAILED=1
run_arm s3_v2 3 || FAILED=1
run_arm s4_v2 4 || FAILED=1
run_arm s6_v2 6 || FAILED=1
run_arm s7_v2 7 || FAILED=1
if [ "$FAILED" -ne 0 ]; then
  stage "queue14 FAILED (one or more arms, see above)"
  exit 1
fi
stage "queue14 complete"
