#!/bin/bash
# Round-5 parallel queue — the CHEAP decisive arms (percep residual
# seed replication, item 4; triplet pull repair, item 5) run concurrently
# with r5_queue1.sh's expensive flagship/multi arms. Rationale: the
# science arms run per-step (fused-equivalence gate failed), and the
# per-step dispatch path leaves the chip idle most of each step waiting
# on the axon relay round-trip — two training processes interleave
# without perturbing each other's METRICS (CLAUDE.md only forbids
# contended BENCHMARKS). wall_time_s in these histories is contended and
# is flagged as such wherever it is reported.
#
# Sentinels are IDENTICAL to r5_queue1.sh's, so whichever queue reaches
# a stage second skips it. This queue must finish D+E before queue1
# clears its multi-video arms (~3.5 h of headroom) — it will.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }
FAILED=0

FUSED_FLAG="--no-fused-epoch"   # match queue1's gate outcome

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

if [ "$FAILED" -ne 0 ]; then
  stage "queue r5.3 FAILED (one or more stages, see above)"
  exit 1
fi
stage "queue r5.3 complete"
