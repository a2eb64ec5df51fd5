#!/bin/bash
# Round-5 hardware queue: the decode-attention kernel A/B matrix the round-4
# verdict flagged as missing (VERDICT.md "Next round" #1).
#
# Matrix: {einsum, --attn_kernel on} x {bf16, int8 KV} x B in {8, 16, 32} on
# both datagen LMs (rewriter: 448-token bucket / 25 new; captioner: prompt
# 311 / 32 new), int8 weights (the production datagen working point), plus
# tools/decode_profile.py --attn_kernel at B in {8, 16} to show the
# attention-only proxy against its cache-read floor. bf16-cache B=32 is
# skipped: it OOM'd in round 4 (BENCHMARKS.md) and the kernel only pads the
# cache larger.
#
# Logs one JSON line per measurement; each step bounded so one hang cannot
# eat the rest.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -6 | tee -a "$LOG"
}

# 0. sanity: the chip answers
timeout 300 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d" \
  || { echo "tunnel down" | tee -a "$LOG"; exit 1; }

# 1. headline re-verify (BENCH_rN contract sanity)
run python bench.py

# 2. rewriter matrix (one B=1 reference arm at the working point, then sweep)
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --batch 8
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --batch 8  --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --batch 16 --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --batch 16 --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --batch 8  --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --batch 8  --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --batch 16 --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --batch 16 --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --batch 32 --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --batch 32 --attn_kernel on --skip_b1

# 3. captioner matrix (same axes; int8 weights = datagen working point)
run python tools/llava_bench.py --weights int8 --cache_dtype bf16 --batch 8
run python tools/llava_bench.py --weights int8 --cache_dtype bf16 --batch 8  --attn_kernel on
run python tools/llava_bench.py --weights int8 --cache_dtype bf16 --batch 16
run python tools/llava_bench.py --weights int8 --cache_dtype bf16 --batch 16 --attn_kernel on
run python tools/llava_bench.py --weights int8 --cache_dtype int8 --batch 8
run python tools/llava_bench.py --weights int8 --cache_dtype int8 --batch 8  --attn_kernel on
run python tools/llava_bench.py --weights int8 --cache_dtype int8 --batch 16
run python tools/llava_bench.py --weights int8 --cache_dtype int8 --batch 16 --attn_kernel on
run python tools/llava_bench.py --weights int8 --cache_dtype int8 --batch 32
run python tools/llava_bench.py --weights int8 --cache_dtype int8 --batch 32 --attn_kernel on

# 4. decomposition: attention proxy vs its cache-read floor, full-step arms
run python tools/decode_profile.py --batch 8  --cache_len 343 --steps 32
run python tools/decode_profile.py --batch 8  --cache_len 343 --steps 32 --attn_kernel
run python tools/decode_profile.py --batch 16 --cache_len 343 --steps 32
run python tools/decode_profile.py --batch 16 --cache_len 343 --steps 32 --attn_kernel

echo "queue done -> $LOG"
