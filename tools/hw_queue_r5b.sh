#!/bin/bash
# Round-5 hardware queue B: reproduce the chip-side --device_preprocess A/B
# from committed tools (VERDICT.md round-4 "Next round" #2 — the -4.6%/-0.6%
# fused-encode tax rows came from an uncommitted /tmp probe) and put a
# hardware number on the raw-staged stage-1 step ("XLA emits no backward for
# the preprocess" had no measurement).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5b.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

timeout 300 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d" \
  || { echo "tunnel down" | tee -a "$LOG"; exit 1; }

# 1. tower encode: plain vs fused preprocess+encode (per-tower delta)
run python tools/tower_bench.py --towers clip_vit_b32_224,clip_rn50x4_288 \
  --device_preprocess --json bench_logs/tower_devpre_r5.json

# 2. stage-1 train step: host-preprocessed f32 vs raw-staged uint8 canvases
#    (fwd+bwd; the preprocess consumes integer inputs so XLA emits no
#    backward for it — this measures that claim). B=32: round 3 measured
#    B=64+remat past the shared dev chip's free HBM (BENCHMARKS.md:135).
run python tools/stage1_bench.py --clip-model-name RN50x4 --batch 32 --dim 288 --grad_ckpt
run python tools/stage1_bench.py --clip-model-name RN50x4 --batch 32 --dim 288 --grad_ckpt --device_preprocess

echo "queue done -> $LOG"
