"""Stage-2 training-step throughput at reference scale.

Measures the flagship hot loop (SURVEY.md §3.1): live text-encoder fwd/bwd +
full-bank InfoNCE over M negatives + masked AdamW, at the clip4cir recipe
scale (batch 256, tau 0.02, RN50x4-sized text tower, CIRR-scale bank).

Methodology matches bench.py (remote-TPU harness): scalar-fetch forcing +
batch differencing between two bank sizes / batch sizes to cancel RPC
constants. Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip-model-name", default="RN50x4")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--bank", type=int, default=60000)
    p.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    p.add_argument("--bank_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"])
    p.add_argument("--fp32", action="store_true",
                   help="fp32 baseline (default bf16)")
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.train.stage2 import create_train_state

    backbone = build_backbone(
        "clip", clip_model_name=args.clip_model_name, tau=0.02,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    params = jax.jit(backbone.init_params)(jax.random.PRNGKey(0))
    state = create_train_state(backbone, params, 2e-5)

    d = backbone.embed_dim
    key = jax.random.PRNGKey(1)

    def make(batch, bank_rows):
        k1, k2, k3 = jax.random.split(key, 3)
        refer = jax.random.normal(k1, (batch, d))
        bank = jax.random.normal(k2, (bank_rows, d))
        bank = bank / jnp.linalg.norm(bank, axis=1, keepdims=True)
        if args.bank_dtype == "int8":
            from spn4cir_tpu.ops.bank_kernels import quantize_bank

            bank = quantize_bank(bank)
        elif args.bank_dtype == "bfloat16":
            bank = bank.astype(jnp.bfloat16)
        text = jax.random.randint(k3, (batch, 77), 0, 49000)
        labels = jax.random.randint(k1, (batch,), 0, bank_rows)
        return refer, bank, text.astype(jnp.int32), labels

    impl = args.impl

    @jax.jit
    def step(state, refer, text, bank, labels):
        def loss_fn(p):
            return backbone.stage2_loss(p, refer, text, bank, labels,
                                        impl=impl)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    def timed(batch, bank_rows, n_steps=4):
        refer, bank, text, labels = make(batch, bank_rows)
        s, loss = step(state, refer, text, bank, labels)  # compile
        float(loss)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            s2 = state
            for _ in range(n_steps):
                s2, loss = step(s2, refer, text, bank, labels)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best

    t = timed(args.batch, args.bank)
    print(json.dumps({
        "metric": "stage2_train_step_seconds",
        "config": {"model": args.clip_model_name, "batch": args.batch,
                   "bank": args.bank, "impl": args.impl,
                   "bank_dtype": args.bank_dtype},
        "value": round(t, 4),
        "triplets_per_sec": round(args.batch / t, 1),
    }))


if __name__ == "__main__":
    main()
