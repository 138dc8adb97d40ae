#!/bin/bash
# Round-4 master queue, session 2. The session-1 environment was reset
# between sessions (data/ is gitignored and was wiped), so this queue
# (a) runs the still-pending round-4 arms and (b) REGENERATES the
# seeded runs whose raw artifacts RESULTS.md already cites (seeded
# reruns are byte-identical, measured in queue10) so the citations
# resolve on disk. New science runs first, regens last:
#   1. s7_v2minrestart  — min-based basin check (RESULTS.md:660 promise)
#   2. triplet_on="p"   — boundary-coupling fix on the triplet objective
#   3. interpolation    — SD-latent lerp/slerp artifact (random weights)
#   4. multi brake_floor — brake + floor-0.55 recovery arm (RESULTS.md:835)
#   5. regen s3_b128, s7_v2min, s5_v2min (artifacts for recorded numbers)
# ADVICE r3 compliance: evals gate on train exit status (PIPESTATUS),
# done-sentinels written only after the LAST eval succeeds, failures
# propagate to a FAILED line + nonzero exit, frame precondition checked.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }
FAILED=0

if [ ! -f data/frames/chinese_chess/0000000000.jpg ]; then
  echo "FATAL: data/frames/chinese_chess is missing — run" \
       "'python -m svtpu.cli extract <video> data/frames/chinese_chess'" >&2
  exit 1
fi

run_arm() {  # name seed extra-flags...
  local NAME=$1 SEED=$2; shift 2
  local OUT="results/flagship_replication"
  if [ -f "$OUT/eval_${NAME}/done.sentinel" ]; then
    stage "flagship_${NAME} (cached)"
    return 0
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
    --history-out "$OUT/history_${NAME}.jsonl" \
    2>&1 | tail -8
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} train FAILED"; return 1; }
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval-consistency FAILED"; return 1; }
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval-hamming FAILED"; return 1; }
  touch "$OUT/eval_${NAME}/done.sentinel"
}

# --- 1. preset v2 + min-based basin check (selection stays mean)
run_arm s7_v2minrestart 7 --restart-on min --restart-min-sep 3 || FAILED=1

# --- 2. triplet_on="p": reference triplet recipe, representation on p
run_triplet_p() {
  local OUT="results/eval_triplet_p"
  if [ -f "$OUT/done.sentinel" ]; then stage "triplet_p (cached)"; return 0; fi
  stage "triplet_p"
  SVTPU_EPOCH_LOG=50 python -u -m svtpu.cli train \
    --variant triplet --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 400 --batch-size 32 --lr 1e-3 \
    --init-temp 1.0 --final-temp 0.5 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --margin 0.2 --alpha 1.0 --beta-kl 1.0 \
    --triplet-distance l2 --contrast-on p \
    --select-by val_loss --seed 1 \
    --save-path data/ckpt/triplet_p --resume \
    --history-out "$OUT/history.jsonl" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_p train FAILED"; return 1; }
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt data/ckpt/triplet_p \
    --out-dir "$OUT" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_p eval-consistency FAILED"; return 1; }
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt data/ckpt/triplet_p \
    --out-dir "$OUT" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_p eval-hamming FAILED"; return 1; }
  touch "$OUT/done.sentinel"
}
run_triplet_p || FAILED=1

# --- 3. interpolation artifact (random SD weights, labeled as such)
run_interp() {
  if [ -f results/interpolation/interpolation_random_weights.png ]; then
    stage "interpolate (cached)"; return 0
  fi
  stage "interpolate"
  mkdir -p results/interpolation
  # timeout guards the fresh TPU compile (decode) against the degraded
  # remote-compile service.
  timeout 2400 python -u -m svtpu.cli interpolate \
    data/frames/chinese_chess/0000000000.jpg \
    data/frames/chinese_chess/0000000400.jpg \
    --ckpt random --steps 8 \
    --out results/interpolation/interpolation_random_weights.png \
    || { echo "=== interpolate FAILED"; return 1; }
}
run_interp || FAILED=1

# --- 4. multi-video brake+floor recovery arm
run_multi() {
  local OUT="results/multi_diagnose"
  if [ -f "$OUT/eval_brake_floor/done.sentinel" ]; then
    stage "multi_brake_floor (cached)"; return 0
  fi
  stage "multi_brake_floor_1500"
  python -u scripts/multi_video_diagnose.py 1500 brake_floor \
    || { echo "=== multi brake_floor train FAILED"; return 1; }
  stage "multi_eval_brake_floor"
  python -u scripts/multi_video_eval.py brake_floor \
    || { echo "=== multi brake_floor eval FAILED"; return 1; }
  touch "$OUT/eval_brake_floor/done.sentinel"
}
run_multi || FAILED=1

# --- 5. regenerate the session-1 arms whose artifacts were lost with data/
run_arm s3_b128 3 --batch-size 128 --lr 1.2e-3 --anneal-rate 4e-3 || FAILED=1
run_arm s7_v2min 7 --sep-aggregate min || FAILED=1
run_arm s5_v2min 5 --sep-aggregate min || FAILED=1

if [ "$FAILED" -ne 0 ]; then
  stage "queue r4.3 FAILED (one or more stages, see above)"
  exit 1
fi
stage "queue r4.3 complete"
