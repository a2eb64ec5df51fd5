#!/bin/bash
# Round-5 hardware queue C: prompt-bucket sweep for the datagen LMs
# (VERDICT.md round-4 "Next round" #3). The rewriter was characterized only
# at the FIQ 448-token few-shot bucket; CIRR uses mod_type=0 composed
# prompts (ref get_cir_data.py:94,169) with a different length distribution
# and the CC paraphrase prompts are longer still. Sweep {256, 640} x batch
# at the round-5 matrix winner config (--attn_kernel on, bf16 KV, chunk 128,
# int8 weights) to fill DECODE_BUCKET_BATCH (datagen/llm_rewrite.py).
# 640-token bf16 B=32 cache would not fit (12.9 GB cache + 6.7 GB weights);
# the int8-cache arm covers B=32 there.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5c.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -4 | tee -a "$LOG"
}

timeout 300 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d" \
  || { echo "tunnel down" | tee -a "$LOG"; exit 1; }

# 256-token bucket (CIRR-composed short prompts)
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --prompt_len 256 --batch 8  --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --prompt_len 256 --batch 16 --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --prompt_len 256 --batch 32 --attn_kernel on --skip_b1

# 640-token bucket (CC paraphrase prompts)
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --prompt_len 640 --batch 8  --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype bf16 --prompt_len 640 --batch 16 --attn_kernel on --skip_b1
run python tools/rewriter_bench.py --weights int8 --prefill_chunk 128 --cache_dtype int8 --prompt_len 640 --batch 32 --attn_kernel on --skip_b1

echo "queue done -> $LOG"
