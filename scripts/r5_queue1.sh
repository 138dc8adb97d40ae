#!/bin/bash
# Round-5 master queue — the VERDICT r4 experiment arms, in priority
# order. Every stage is sentinel-guarded and resumable; training runs
# resume their checkpoints, so re-running the queue after a kill/timeout
# continues where it stopped.
#
#   A. fused-epoch seeded hardware equivalence gate (item 1; the bench
#      half ran separately: per_step 1.047 s/ep vs fused 0.784 = 1.34x).
#      If the gate FAILS, every later science arm runs --no-fused-epoch.
#   B. min-basin-check preset decision, seeds 5/8/3/6 (item 2).
#      Predictions recorded in results/r5_predictions.md BEFORE running.
#   C. multi-video arms: brake_defer + hardened_s2 (+ braked_minrestart
#      last) (item 3).
#   D. percep residual-fix seed replication (item 4).
#   E. constructive triplet repair: anchor<->positive pull sweep (item 5).
#   F. batch-128 recipe seeds 4 and 6 (items 6+8 — the histories'
#      wall_time_s give the fused-epoch wall-clock attribution).
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }
FAILED=0

if [ ! -f data/frames/chinese_chess/0000000000.jpg ]; then
  echo "FATAL: data/frames/chinese_chess missing" >&2
  exit 1
fi

OUT="results/flagship_replication"

# ---------------- A. fused equivalence gate ----------------
FUSED_FLAG=""
run_equiv_leg() {  # name extra-flags...
  local NAME=$1; shift
  SVTPU_EPOCH_LOG=50 timeout 4800 python -u -m svtpu.cli train \
    --preset flagship --video chinese_chess \
    --frames-dir data/frames/chinese_chess --seed 3 --epochs 120 \
    "$@" \
    --save-path "data/ckpt/fused_equiv_${NAME}" \
    --history-out "results/fused_equiv_${NAME}.jsonl" 2>&1 | tail -3
  return "${PIPESTATUS[0]}"
}
if [ ! -f results/fused_equiv.json ]; then
  stage "fused_equiv (120-epoch flagship, fused vs per-step, seed 3)"
  run_equiv_leg fused || FAILED=1
  run_equiv_leg perstep --no-fused-epoch || FAILED=1
  python scripts/compare_histories.py \
    results/fused_equiv_fused.jsonl results/fused_equiv_perstep.jsonl \
    > results/fused_equiv.json
  cat results/fused_equiv.json
fi
if ! grep -q '"ok": true' results/fused_equiv.json 2>/dev/null; then
  stage "fused equivalence NOT confirmed -> science arms run per-step"
  FUSED_FLAG="--no-fused-epoch"
fi

# ---------------- shared flagship arm runner ----------------
run_arm() {  # name seed extra-flags...
  local NAME=$1 SEED=$2; shift 2
  if [ -f "$OUT/eval_${NAME}/done.sentinel" ]; then
    stage "flagship_${NAME} (cached)"
    return 0
  fi
  stage "flagship_${NAME}"
  SVTPU_EPOCH_LOG=100 timeout 7200 python -u -m svtpu.cli train \
    --preset flagship --video chinese_chess \
    --frames-dir data/frames/chinese_chess --seed "$SEED" \
    $FUSED_FLAG "$@" \
    --save-path "data/ckpt/flagship_${NAME}" --resume \
    --history-out "$OUT/history_${NAME}.jsonl" \
    2>&1 | tail -8
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} train FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval-consistency FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval-hamming FAILED"; return 1; }
  touch "$OUT/eval_${NAME}/done.sentinel"
}

# ---------------- B. min-basin-check arms ----------------
run_arm s5_v2minrestart 5 --restart-on min --restart-min-sep 3 || FAILED=1
run_arm s8_v2minrestart 8 --restart-on min --restart-min-sep 3 || FAILED=1
run_arm s3_v2minrestart 3 --restart-on min --restart-min-sep 3 || FAILED=1
run_arm s6_v2minrestart 6 --restart-on min --restart-min-sep 3 || FAILED=1

# ---------------- C. multi-video arms (1 + 2; restart arm last) -------
run_multi() {  # arm
  local ARM=$1
  if [ -f "results/multi_diagnose/eval_${ARM}/done.sentinel" ]; then
    stage "multi_${ARM} (cached)"; return 0
  fi
  stage "multi_${ARM}"
  timeout 10800 python -u scripts/multi_video_diagnose.py 1500 "$ARM" \
    || { echo "=== multi ${ARM} train FAILED"; return 1; }
  timeout 2400 python -u scripts/multi_video_eval.py "$ARM" \
    || { echo "=== multi ${ARM} eval FAILED"; return 1; }
  touch "results/multi_diagnose/eval_${ARM}/done.sentinel"
}
run_multi brake_defer || FAILED=1
run_multi hardened_s2 || FAILED=1

# ---------------- D. percep residual seed replication ----------------
if [ ! -f data/embeddings_synth.npy ]; then
  stage "make_synth_embeddings"
  python scripts/make_synth_embeddings.py data/embeddings_synth.npy
fi
run_percep() {  # tag seed extra-eval-flags...
  local TAG=$1 SEED=$2; shift 2
  local NAME="${TAG}_s${SEED}"
  if [ -f "results/percep_fix/eval_${NAME}/done.sentinel" ]; then
    stage "percep_${NAME} (cached)"; return 0
  fi
  stage "percep_${NAME}"
  EPOCHS_ref4_residual=400 EPOCHS_lstm2_full=600 \
    timeout 7200 python -u scripts/percep_fix_runs.py "${TAG}@${SEED}" \
    || { echo "=== percep ${NAME} train FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-consistency \
    --video chinese_chess --embeddings data/embeddings_synth.npy \
    --variant percep --latent-dim 25 "$@" \
    --ckpt "data/ckpt/percep_${NAME}" \
    --out-dir "results/percep_fix/eval_${NAME}" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== percep ${NAME} eval FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-hamming \
    --video chinese_chess --embeddings data/embeddings_synth.npy \
    --variant percep --latent-dim 25 "$@" \
    --ckpt "data/ckpt/percep_${NAME}" \
    --out-dir "results/percep_fix/eval_${NAME}" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== percep ${NAME} eval-hamming FAILED"; return 1; }
  touch "results/percep_fix/eval_${NAME}/done.sentinel"
}
run_percep ref4_residual 2 --lstm-residual || FAILED=1
run_percep ref4_residual 3 --lstm-residual || FAILED=1
run_percep ref4_residual 4 --lstm-residual || FAILED=1
run_percep lstm2_full 2 --lstm-layers 2 || FAILED=1
run_percep lstm2_full 3 --lstm-layers 2 || FAILED=1

# ---------------- E. triplet repair (anchor<->positive pull) ----------
run_triplet_pull() {  # tag weight
  local TAG=$1 W=$2
  local OUTD="results/eval_triplet_pull${TAG}"
  if [ -f "$OUTD/done.sentinel" ]; then
    stage "triplet_pull${TAG} (cached)"; return 0
  fi
  stage "triplet_pull${TAG} (weight $W)"
  SVTPU_EPOCH_LOG=50 timeout 4800 python -u -m svtpu.cli train \
    --variant triplet --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 400 --batch-size 32 --lr 1e-3 \
    --init-temp 1.0 --final-temp 0.5 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --margin 2.0 --alpha 1.0 --beta-kl 0.2 \
    --triplet-distance l2 --contrast-on p --triplet-pull "$W" \
    --select-by combined --seed 1 $FUSED_FLAG \
    --save-path "data/ckpt/triplet_pull${TAG}" --resume \
    --history-out "$OUTD/history.jsonl" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_pull${TAG} train FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt "data/ckpt/triplet_pull${TAG}" \
    --out-dir "$OUTD" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_pull${TAG} eval FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt "data/ckpt/triplet_pull${TAG}" \
    --out-dir "$OUTD" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_pull${TAG} eval-hamming FAILED"; return 1; }
  touch "$OUTD/done.sentinel"
}
run_triplet_pull 1 1.0 || FAILED=1
run_triplet_pull 4 4.0 || FAILED=1
run_triplet_pull 05 0.5 || FAILED=1

# ---------------- F. batch-128 recipe, weak + mid seeds ----------------
run_arm s4_b128 4 --batch-size 128 --lr 1.2e-3 --anneal-rate 4e-3 || FAILED=1
run_arm s6_b128 6 --batch-size 128 --lr 1.2e-3 --anneal-rate 4e-3 || FAILED=1

# ---------------- C (cont). the restart arm, lowest decision value ----
run_multi braked_minrestart || FAILED=1

if [ "$FAILED" -ne 0 ]; then
  stage "queue r5.1 FAILED (one or more stages, see above)"
  exit 1
fi
stage "queue r5.1 complete"
