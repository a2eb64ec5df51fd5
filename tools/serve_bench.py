"""Serving-path cost on the real TPU chip: fused CIR query -> top-k.

Measures the device work a RetrievalService dispatch performs — text encode
+ fuse + full-gallery score + top-k — for coalesced batches of 1..32
queries against a production-size gallery, and derives single-chip QPS.

End-to-end HTTP latency cannot be measured meaningfully on the dev harness
(per-dispatch RPC is 2.5-4 s through the tunnel; see BENCHMARKS.md), so this
uses the same scalar-fetch + min-of-N methodology as bench.py and reports
device time per dispatch. The HTTP + micro-batching layers are covered
functionally by tests/test_serve.py (32 concurrent requests coalesce into
<= 8 dispatches).

Usage: python tools/serve_bench.py [--gallery 16384] [--json out]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    return float(jnp.sum(x if x.dtype == jnp.float32 else x.astype(jnp.float32)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=16384)
    p.add_argument("--model", default="ViT-B/32")
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--json", default="")
    args = p.parse_args()

    from spn4cir_tpu.models.api import build_backbone

    print("devices:", jax.devices(), flush=True)
    bb = build_backbone("clip", clip_model_name=args.model, dtype=jnp.bfloat16)
    params = jax.jit(bb.init_params)(jax.random.PRNGKey(0))

    m, d = args.gallery, bb.embed_dim
    target = jax.jit(lambda k: jax.random.normal(k, (m, d), jnp.bfloat16))(
        jax.random.PRNGKey(1))

    # the exact device work RetrievalService._run / _run_batch dispatches:
    # fuse(refer, text) -> score against the gallery -> top-k
    def query(params, refer, text_ids, target):
        q = bb.fuse(params, refer, text_ids)
        scores = bb.score_queries(q, target)
        return jax.lax.top_k(scores, args.k)

    jquery = jax.jit(query)

    results = {}
    times = {}
    for batch in (1, 8, 32):
        refer = jax.jit(lambda k: jax.random.normal(
            k, (batch, d), jnp.bfloat16))(jax.random.PRNGKey(batch))
        text = jnp.asarray(bb.tokenize(
            ["is shorter and has a floral pattern"] * batch))
        vals, idx = jquery(params, refer, text, target)  # compile
        force(vals)
        best = []
        for _ in range(7):
            t0 = time.monotonic()
            vals, idx = jquery(params, refer, text, target)
            force(vals)
            best.append(time.monotonic() - t0)
        times[batch] = min(best)
        print(f"  raw dispatch B={batch}: {times[batch]*1e3:.0f} ms (incl. RPC)",
              flush=True)

    # RPC constant cancels in the B=32 vs B=1 difference; per-query marginal
    # device cost and derived QPS at full micro-batches:
    marginal = (times[32] - times[1]) / 31
    # device time of a B=32 dispatch ~= marginal * 32 + fixed device overhead;
    # bound fixed overhead by the B=8 point
    fixed = max(times[8] - times[1] - 7 * marginal, 0.0)
    per_batch32 = 32 * marginal + fixed
    qps = 32 / max(per_batch32, 1e-9)
    print(f"  marginal device cost: {marginal*1e6:.0f} us/query; "
          f"B=32 dispatch ~{per_batch32*1e3:.2f} ms -> ~{qps:,.0f} QPS/chip "
          f"(gallery {m}, k={args.k})", flush=True)
    results = {"gallery": m, "k": args.k, "model": args.model,
               "marginal_us_per_query": round(marginal * 1e6, 1),
               "batch32_dispatch_ms": round(per_batch32 * 1e3, 3),
               "derived_qps_per_chip": round(qps, 0)}
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
