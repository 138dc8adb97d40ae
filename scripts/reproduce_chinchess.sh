#!/bin/bash
# End-to-end reproduction of the RESULTS.md chinchess numbers on a TPU host.
set -euo pipefail
cd "$(dirname "$0")/.."

make -C native                            # native IO library (optional)

python -m svtpu.cli extract \
    /root/reference/videos/chinchess_gettyimages-148739276-640_adpp.mp4 \
    data/frames/chinese_chess --backend native

python -u -m svtpu.cli train --variant contrastive --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 300 --batch-size 32 --lr 3e-4 \
    --init-temp 2.0 --final-temp 0.2 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 --margin 0.5 \
    --alpha 2.0 --beta-kl 1.0 --save-path data/ckpt/chinchess_long

for ev in eval-consistency eval-hamming eval-projections eval-probe; do
  python -u -m svtpu.cli $ev --video chinese_chess \
      --frames-dir data/frames/chinese_chess \
      --ckpt data/ckpt/chinchess_long --variant contrastive \
      --latent-dim 25 --out-dir data/eval_out
done

python bench.py
