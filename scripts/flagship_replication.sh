#!/bin/bash
# VERDICT r2 item 4: error bars on the flagship recipe. Runs the EXACT
# flagship config (z_grid.sh base + the flagship deltas recorded in
# CLAUDE.md / RESULTS.md: contrast_on=p, contextfree, margin 3.5,
# noise 0.3, eval-noise 0.1, beta_kl 0.2, alpha 4, select combined,
# latent 25, 1000 epochs) for the given seeds, serially. Seeds 1 and 2
# were measured in round 2 (data/ckpt/p_hardened{,_s2}); this adds more.
set -uo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-1000}"
SEEDS="${SEEDS:-3 4 5 6 7}"
for SEED in $SEEDS; do
  SVTPU_EPOCH_LOG=50 python -u -m svtpu.cli train \
    --variant contrastive --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs "$EPOCHS" --batch-size 32 --lr 3e-4 \
    --init-temp 2.0 --final-temp 0.2 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --contrast-on p --contextfree-contrast --margin 3.5 \
    --noise-ratio 0.3 --eval-noise-ratio 0.1 --beta-kl 0.2 --alpha 4.0 \
    --select-by combined --seed "$SEED" \
    --save-path "data/ckpt/flagship_s$SEED" --resume \
    --history-out "results/flagship_replication/history_s$SEED.jsonl" \
    2>&1 | tail -3
  # Held-out test re-eval, the round-2 protocol (10 trials, temp 0.2).
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s$SEED" \
    --out-dir "results/flagship_replication/eval_s$SEED" 2>&1 | tail -4
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s$SEED" \
    --out-dir "results/flagship_replication/eval_s$SEED" 2>&1 | tail -3
  echo "=== flagship seed $SEED done"
done
