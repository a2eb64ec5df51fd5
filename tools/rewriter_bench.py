"""LLaMA-2 rewriter throughput on the chip: batched vs per-prompt.

The reference rewrites one prompt per HF `generate` call on a V100
(zscir/llama_generate.py:64, batch_size=1). At 7B the decode phase is
weight-bandwidth-bound, so B prompts per call cost nearly the same HBM
traffic as one — the batched left-padded path (`llama_generate` with
attention_mask; datagen --llm_batch) should scale rewriting throughput
nearly linearly in B until the MXU/prefill share dominates.

Measures, with random device-created weights (throughput is weight-value
independent) at the FIQ rewrite working point (few-shot chat prompt ~450
tokens, 25 new tokens):
  1. B=1 dense generate (the reference's mode, JAX execution);
  2. B=N left-padded generate with attention_mask + per-row RoPE (the
     --llm_batch mode, including its masking overhead).

Run: python tools/rewriter_bench.py [--size 7b|tiny] [--batch 8]
     [--weights int8|bf16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the axon sitecustomize overrides env JAX_PLATFORMS via config.update;
# honor an explicit env request (CPU smoke runs) by forcing it back
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from llava_bench import force, random_params_like  # noqa: E402 (same dir)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="7b", choices=["7b", "tiny"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt_len", type=int, default=448,
                   help="padded prompt bucket (FIQ few-shot ~430-450 toks)")
    p.add_argument("--new_tokens", type=int, default=25,
                   help="max_new_tokens_for('fiq') == 25")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--quant_kernel", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused int8 Pallas matmul (ops/quant_matmul.py), DECODE steps only — prefill always uses the XLA path; auto = on for single-device TPU")
    p.add_argument("--weights", default="int8", choices=["bf16", "int8"])
    p.add_argument("--prefill_chunk", type=int, default=0,
                   help="chunked prefill size (0 = dense one-shot)")
    p.add_argument("--cache_dtype", default="bf16",
                   choices=["f32", "bf16", "int8"],
                   help="KV cache precision (int8: per-row scales)")
    p.add_argument("--attn_kernel", default="off",
                   choices=["on", "off"],
                   help="fused Pallas decode attention (ops/decode_attn.py)"
                        " — decode steps only; pads the cache to a lane"
                        " multiple")
    p.add_argument("--skip_b1", action="store_true",
                   help="skip the B=1 reference arm (matrix sweeps re-use "
                        "the recorded B=1 rate)")
    args = p.parse_args()

    from spn4cir_tpu.models.llama import (LlamaConfig, LlamaLM,
                                          llama_generate,
                                          quantize_llama_weights)

    cfg = (LlamaConfig.llama2_7b_chat() if args.size == "7b"
           else LlamaConfig.tiny())
    B, P, T = args.batch, args.prompt_len, args.new_tokens

    lshapes = jax.eval_shape(
        lambda k: LlamaLM(cfg).init(k, input_ids=jnp.zeros((1, 4), jnp.int32)),
        jax.random.PRNGKey(0))
    if args.weights == "int8":
        qshapes = jax.eval_shape(quantize_llama_weights, lshapes["params"])
        params = random_params_like(qshapes)
    else:
        params = random_params_like(lshapes)["params"]

    def embeds_for(batch, key):
        return jax.jit(lambda k: jax.random.normal(
            k, (batch, P, cfg.hidden_size), jnp.bfloat16) * 0.02)(key)

    # ragged lengths: rows span [P-96, P] like a sorted length bucket
    lens = np.linspace(max(1, P - 96), P, B).astype(np.int32)
    mask = (np.arange(P)[None, :] >= (P - lens[:, None])).astype(np.int32)

    gen_kw = dict(eos_id=2, pad_id=2, max_new_tokens=T, do_sample=True,
                  temperature=1.0, top_p=1.0, top_k=10,
                  cache_dtype={"f32": jnp.float32, "bf16": jnp.bfloat16,
               "int8": jnp.int8}[args.cache_dtype],
                  prefill_chunk=args.prefill_chunk or None,
                  quant_kernel={"auto": None, "on": True,
                                "off": False}[args.quant_kernel],
                  attn_kernel=args.attn_kernel == "on")

    def bench(fn, *xs):
        out = fn(*xs)
        force(out)
        times = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            out = fn(*xs)
            force(out)
            times.append(time.monotonic() - t0)
        return min(times)

    # 1) B=1, dense (reference mode)
    t1 = None
    if not args.skip_b1:
        gen1 = jax.jit(lambda p_, e, r: llama_generate(p_, cfg, e, rng=r,
                                                       **gen_kw))
        t1 = bench(gen1, params, embeds_for(1, jax.random.PRNGKey(1)),
                   jax.random.PRNGKey(2))
        print(json.dumps({"metric": "rewriter_b1", "seconds": round(t1, 3),
                          "prompts_per_sec": round(1 / t1, 2),
                          "prompt_len": P, "new_tokens": T,
                          "cache_dtype": args.cache_dtype,
                          "weights": args.weights}), flush=True)

    # 2) B=N, left-padded + attention_mask (--llm_batch mode)
    genb = jax.jit(lambda p_, e, m, r: llama_generate(
        p_, cfg, e, rng=r, attention_mask=m, **gen_kw))
    tb = bench(genb, params, embeds_for(B, jax.random.PRNGKey(3)),
               jnp.asarray(mask), jax.random.PRNGKey(4))
    row = {"metric": f"rewriter_b{B}_masked",
           "seconds": round(tb, 3),
           "prompts_per_sec": round(B / tb, 2)}
    if t1 is not None:
        row["speedup_vs_b1"] = round((B / tb) / (1 / t1), 2)
    print(json.dumps({**row,
                      "prompt_len": P, "new_tokens": T,
                      "prefill_chunk": args.prefill_chunk,
                      "cache_dtype": args.cache_dtype,
                      "attn_kernel": args.attn_kernel,
                      "weights": args.weights}), flush=True)


if __name__ == "__main__":
    main()
