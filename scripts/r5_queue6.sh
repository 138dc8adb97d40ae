#!/bin/bash
# Round-5 triplet repair, arm 3: context-free push(+pull) — the
# mechanism-matched follow-up to push1's measured in-context/probe-axis
# drift. Waits for queue5 (pid in /tmp/r5q5.pid) to release the slot.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

Q5=$(cat /tmp/r5q5.pid 2>/dev/null || echo 0)
if [ "$Q5" -gt 0 ]; then
  stage "waiting for queue5 (pid $Q5)"
  while kill -0 "$Q5" 2>/dev/null; do sleep 30; done
fi

TAG=pushcf
OUTD="results/eval_triplet_${TAG}"
if [ -f "$OUTD/done.sentinel" ]; then stage "triplet_${TAG} (cached)"; exit 0; fi
stage "triplet_${TAG}"
SVTPU_EPOCH_LOG=50 timeout 4800 python -u -m svtpu.cli train \
  --variant triplet --video chinese_chess \
  --frames-dir data/frames/chinese_chess --latent-dim 25 \
  --epochs 400 --batch-size 32 --lr 1e-3 \
  --init-temp 1.0 --final-temp 0.5 --anneal-rate 1e-3 \
  --num-steps-to-update 4 --bernoulli-p 0.1 \
  --margin 2.0 --alpha 1.0 --beta-kl 0.2 \
  --triplet-distance l2 --contrast-on p \
  --triplet-push 1.0 --triplet-pull 1.0 --contextfree-contrast \
  --select-by combined --seed 1 --no-fused-epoch \
  --save-path "data/ckpt/triplet_${TAG}" --resume \
  --history-out "$OUTD/history.jsonl" 2>&1 | tail -4
[ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_${TAG} train FAILED"; exit 1; }
timeout 2400 python -u -m svtpu.cli eval-consistency --video chinese_chess \
  --frames-dir data/frames/chinese_chess --variant triplet \
  --latent-dim 25 --ckpt "data/ckpt/triplet_${TAG}" \
  --out-dir "$OUTD" 2>&1 | tail -3
timeout 2400 python -u -m svtpu.cli eval-hamming --video chinese_chess \
  --frames-dir data/frames/chinese_chess --variant triplet \
  --latent-dim 25 --ckpt "data/ckpt/triplet_${TAG}" \
  --out-dir "$OUTD" 2>&1 | tail -3
touch "$OUTD/done.sentinel"
stage "queue r5.6 complete"
