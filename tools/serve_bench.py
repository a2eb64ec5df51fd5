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
    p.add_argument("--gallery_dtype", default="bfloat16",
                   choices=["bfloat16", "int8"],
                   help="int8 measures the quantized-gallery serving path "
                        "(serve/service.py:quantized_score_queries)")
    p.add_argument("--json", default="")
    args = p.parse_args()

    from spn4cir_tpu.models.api import build_backbone

    print("devices:", jax.devices(), flush=True)
    bb = build_backbone("clip", clip_model_name=args.model, dtype=jnp.bfloat16)
    params = jax.jit(bb.init_params)(jax.random.PRNGKey(0))

    m, d = args.gallery, bb.embed_dim
    target = jax.jit(lambda k: jax.random.normal(k, (m, d), jnp.bfloat16))(
        jax.random.PRNGKey(1))
    if args.gallery_dtype == "int8":
        from spn4cir_tpu.ops.bank_kernels import quantize_bank
        from spn4cir_tpu.serve.service import quantized_score_queries

        target = jax.jit(quantize_bank)(target.astype(jnp.float32))
        score = quantized_score_queries
    else:
        score = bb.score_queries

    # the exact device work RetrievalService._run / _run_batch dispatches:
    # fuse(refer, text) -> score against the gallery -> top-k
    def query(params, refer, text_ids, target):
        q = bb.fuse(params, refer, text_ids)
        scores = score(q, target)
        return jax.lax.top_k(scores, args.k)

    jquery = jax.jit(query)

    # True device time per dispatch (INCLUDING fixed per-dispatch device
    # cost): chain R sequential query dispatches inside one jit — each
    # iteration consumes the previous top-k values so XLA cannot parallelize
    # or CSE them — and difference chain(R) vs chain(1). Host/RPC constants
    # cancel; fixed + marginal device work both scale with R. (A previous
    # version tried fixed = t[8]-t[1]-7*marginal across separate dispatches,
    # which cancels algebraically and measures nothing.)
    def make_chain(batch, r):
        refer0 = jax.jit(lambda k: jax.random.normal(
            k, (batch, d), jnp.bfloat16))(jax.random.PRNGKey(batch))
        text = jnp.asarray(bb.tokenize(
            ["is shorter and has a floral pattern"] * batch))

        @jax.jit
        def run(refer, text, target):
            def body(carry, _):
                ref_c, txt_c = carry
                vals, idx = query(params, ref_c, txt_c, target)
                # thread the result into BOTH inputs so no stage (text
                # encode included) is loop-invariant and hoistable
                fbump = (jnp.sum(vals) * 0.0).astype(ref_c.dtype)
                ibump = jnp.max(idx[:, :1], axis=-1, keepdims=True) * 0
                return (ref_c + fbump, txt_c + ibump.astype(txt_c.dtype)), \
                    vals[:, 0]
            (_, _), tops = jax.lax.scan(body, (refer, text), None, length=r)
            return tops

        return run, refer0, text

    def best_time(fn, *a, n=6):
        force(fn(*a))
        ts = []
        for _ in range(n):
            t0 = time.monotonic()
            force(fn(*a))
            ts.append(time.monotonic() - t0)
        return min(ts)

    results = {}
    for batch in (1, 32):
        # B=1 device work is tiny vs harness jitter: amplify with a longer
        # chain so the difference rises above the RPC noise floor
        reps = 64 if batch == 1 else 8
        r1, a1, t1_ = make_chain(batch, 1)
        r8, a8, t8_ = make_chain(batch, reps)
        t1 = best_time(r1, a1, t1_, target)
        t8 = best_time(r8, a8, t8_, target)
        per = (t8 - t1) / (reps - 1)
        results[f"dispatch_ms_b{batch}"] = round(per * 1e3, 3)
        print(f"  device time per B={batch} dispatch: {per*1e3:.3f} ms",
              flush=True)
    qps = 32 / max(results["dispatch_ms_b32"] / 1e3, 1e-9)
    print(f"  -> ~{qps:,.0f} QPS/chip at full 32-query micro-batches "
          f"(gallery {m}, k={args.k})", flush=True)
    results.update({"gallery": m, "k": args.k, "model": args.model,
                    "derived_qps_per_chip": round(qps, 0)})
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
