#!/bin/bash
# Round-3 pending hardware runs, serial (one chip; contended runs are
# garbage — CLAUDE.md).  Each stage is independently resumable; rerun the
# script and completed stages skip (checkpoints/artifacts checked).
# Log: results/r3_queue.log (driven by the session, tail -f to watch).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results data/ckpt

stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

# ---- 0. frames (idempotent) -------------------------------------------
if [ ! -f data/frames/chinese_chess/0000000479.jpg ]; then
  python -m svtpu.cli extract \
    /root/reference/videos/chinchess_gettyimages-148739276-640_adpp.mp4 \
    data/frames/chinese_chess --backend native
fi

# ---- 1. triplet Bernoulli-JS post-fix rerun (RESULTS TBD row) ---------
if [ ! -f results/eval_triplet_js/consistency.csv ]; then
  stage "triplet_js_rerun"
  bash scripts/triplet_js_rerun.sh
fi

# ---- 2. seed-5 auto-restart causal validation -------------------------
# The exact flagship config, the exact failing seed, with the basin
# check armed.  Expected: restart fires at epoch 250, folded-seed run
# converges (>=0.9 combined).
if [ ! -f results/flagship_replication/eval_s5_restart/consistency.csv ]; then
  stage "seed5_restart"
  SVTPU_EPOCH_LOG=50 python -u -m svtpu.cli train \
    --variant contrastive --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 1000 --batch-size 32 --lr 3e-4 \
    --init-temp 2.0 --final-temp 0.2 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --contrast-on p --contextfree-contrast --margin 3.5 \
    --noise-ratio 0.3 --eval-noise-ratio 0.1 --beta-kl 0.2 --alpha 4.0 \
    --select-by combined --seed 5 \
    --restart-check-epoch 250 --restart-min-sep 3.0 --max-restarts 3 \
    --save-path data/ckpt/flagship_s5_restart --resume \
    --history-out results/flagship_replication/history_s5_restart.jsonl \
    2>&1 | tail -4
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt data/ckpt/flagship_s5_restart \
    --out-dir results/flagship_replication/eval_s5_restart 2>&1 | tail -4
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt data/ckpt/flagship_s5_restart \
    --out-dir results/flagship_replication/eval_s5_restart 2>&1 | tail -3
fi

# ---- 3. multi-video erosion diagnosis (VERDICT item 10) ---------------
if [ ! -f results/multi_diagnose/beta_low.jsonl ] || \
   ! tail -1 results/multi_diagnose/beta_low.jsonl 2>/dev/null | grep -q '"epoch": 700'; then
  stage "multi_video_diagnose"
  python -u scripts/multi_video_diagnose.py 700 control beta_low
fi

# ---- 4. percep_p sweep (VERDICT item 2 deliverable) --------------------
if [ ! -f data/embeddings_synth.npy ]; then
  python scripts/make_synth_embeddings.py data/embeddings_synth.npy
fi
if [ ! -f results/percep_sweep/sweep_results.json ]; then
  stage "percep_p_sweep"
  python -u -m svtpu.cli sweep --variant percep_p \
    --video chinese_chess --embeddings data/embeddings_synth.npy \
    --count 10 --seed 0 --no-wandb \
    --save-dir results/percep_sweep 2>&1 | tail -20
fi

stage "queue complete"
