#!/bin/bash
# Round-3 bench stage (idle chip required — run after all training
# queues): int8 encode-trunk evaluation + headline refresh.
#  1. op-level int8-vs-bf16 MXU probe (matmul + headline conv1 shape)
#  2. integrated encode A/B on random-init weights (worst-case code
#     mismatch bound) and on a TRAINED flagship checkpoint with real
#     chinchess frames (the meaningful fidelity number)
#  3. bench.py headline (records the round's official number)
set -uo pipefail
cd "$(dirname "$0")/.."

stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

stage "int8_probe"
python -u benchmarks/bench_suite.py int8_probe

stage "int8_ab_random_init"
python -u benchmarks/bench_suite.py int8_ab

CKPT=""
for c in data/ckpt/flagship_s8_hardened data/ckpt/flagship_s9_hardened \
         data/ckpt/flagship_s10_hardened data/ckpt/flagship_s3_floor; do
  [ -d "$c" ] && CKPT="$c" && break
done
if [ -n "$CKPT" ]; then
  stage "int8_ab_trained ($CKPT)"
  SVTPU_INT8_CKPT="$CKPT" SVTPU_INT8_LATENT=25 \
    SVTPU_INT8_FRAMES=data/frames/chinese_chess \
    python -u benchmarks/bench_suite.py int8_ab
else
  stage "int8_ab_trained SKIPPED (no trained ckpt found)"
fi

stage "headline"
python -u bench.py

stage "queue8 complete"
