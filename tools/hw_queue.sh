#!/bin/bash
# One-shot runner for the hardware A/Bs queued while the axon TPU tunnel was
# down (ROUND3_NOTES "queued for hardware"). Run when `jax.devices()` shows
# the real chip again; logs one JSON line per measurement to stdout and the
# log file. Each step is individually bounded so one hang can't eat the rest.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -5 | tee -a "$LOG"
}

# 0. sanity: the chip answers
timeout 300 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d" \
  || { echo "tunnel still down" | tee -a "$LOG"; exit 1; }

# 1. headline re-verify (BENCH_rN contract)
run python bench.py

# 2. fused int8 matmul decode A/B (ops/quant_matmul.py) on the 7B captioner
run python tools/llava_bench.py --size 7b --weights int8 --quant_kernel off --batch 8
run python tools/llava_bench.py --size 7b --weights int8 --quant_kernel on --batch 8

# 3. same A/B on the rewriter LM
run python tools/rewriter_bench.py --weights int8 --quant_kernel off
run python tools/rewriter_bench.py --weights int8 --quant_kernel on

# 4. causal-packed text-encode A/B (ViT-L/14 + RN50x4 text towers) + S=197
#    packing experiment (ViT-B/16 @ 224 -> S=197 vision encode, --attn
#    packed forces the packed kernel past its S<=128 auto gate)
run python tools/tower_bench.py --text --towers clip_vit_l14_224,clip_rn50x4_288 --attn xla
run python tools/tower_bench.py --text --towers clip_vit_l14_224,clip_rn50x4_288 --attn auto
run python tools/tower_bench.py --towers clip_vit_b16_224 --attn xla
run python tools/tower_bench.py --towers clip_vit_b16_224 --attn packed

# 5. prepared-bank step re-verify at blip2 CIRR scale
run python tools/prepared_bank_bench.py

echo "queue done -> $LOG"
