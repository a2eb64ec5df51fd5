#!/bin/bash
set -u
cd "$(dirname "$0")/.."
LOG=bench_logs/hw_queue_r5d.log
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -6 | tee -a "$LOG"
}
# fill the two imputed cells of the round-5 bucket table:
# 1. 256-bucket int8-KV B=32 (currently inherits the 448 measurement)
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --prompt_len 256 --batch 32 --attn_kernel on --skip_b1
# 2. 640-bucket bf16 B=16 (stalled twice on the dev tunnel; third try)
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --prompt_len 640 --batch 16 --attn_kernel on --skip_b1
echo "queue done -> $LOG"
