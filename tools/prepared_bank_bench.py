"""Hardware A/B: per-step bank relayout vs the prepared persistent layout.

Measures the blip2 CIRR-scale stage-2 step (B=32, 60k-row (M,32,256) bank)
and the flat RN50x4-scale step (B=256, 60k x 640) with the bank passed raw
(kernel wrapper pads/transposes inside the jitted step) vs prepared ONCE
(ops.bank_kernels.prepare_bank / ops.maxquery_kernels.prepare_max_query_bank
— VERDICT round-3 item #5). Prints one JSON line per config.

Run on the TPU chip: python tools/prepared_bank_bench.py
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
    return float(jnp.asarray(x).reshape(-1)[0])


def synthetic_bert_vocab_file():
    import tempfile

    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[DEC]", "[ENC]"]
    toks += [f"tok{i}" for i in range(30522 - len(toks))]
    f = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
    f.write("\n".join(toks))
    f.close()
    return f.name


def bench(name, backbone_name, bb_kw, batch, bank_rows, *, prepare,
          bank_dtype=jnp.bfloat16, repeats=5):
    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.train.stage2 import create_train_state, stage2_train_step

    if backbone_name in ("blip", "blip2"):
        bb_kw = dict(bb_kw, bert_vocab_path=synthetic_bert_vocab_file())
    bb = build_backbone(backbone_name, dtype=jnp.bfloat16, **bb_kw)
    params = jax.jit(bb.init_params)(jax.random.PRNGKey(0))
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    flat = {k: (v if bb.trainable_filter(k) or v.dtype != jnp.float32
                else v.astype(jnp.bfloat16)) for k, v in flat.items()}
    params = traverse_util.unflatten_dict(flat)
    spec = bb.bank_spec()
    state = create_train_state(bb, params, 2e-5)
    bank = jax.jit(lambda k: jax.random.normal(
        k, (bank_rows, *spec.target_shape), bank_dtype))(jax.random.PRNGKey(1))
    if prepare:
        if len(spec.target_shape) == 2:
            from spn4cir_tpu.ops.maxquery_kernels import prepare_max_query_bank

            bank = prepare_max_query_bank(bank)
        else:
            from spn4cir_tpu.ops.bank_kernels import prepare_bank

            bank = prepare_bank(bank)
        jax.block_until_ready(jax.tree_util.tree_leaves(bank))
    refer = jax.jit(lambda k: jax.random.normal(
        k, (batch, *spec.refer_shape), jnp.bfloat16))(jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    text = jnp.asarray(bb.tokenize(
        ["make the dress shorter and more casual"] * batch))
    labels = jnp.asarray(rng.randint(0, bank_rows, size=(batch,)))
    batch_d = {"refer_feats": refer, "text_ids": text, "labels": labels}

    state, loss = stage2_train_step(bb, state, bank, batch_d)  # compile
    force(loss)
    times = []
    for _ in range(repeats):
        t0 = time.monotonic()
        state, loss = stage2_train_step(bb, state, bank, batch_d)
        force(loss)
        times.append(time.monotonic() - t0)
    t0 = time.monotonic()
    force(loss)
    rpc = time.monotonic() - t0
    step = max(min(times) - rpc, 1e-9)
    print(json.dumps({
        "metric": f"{name}_{'prepared' if prepare else 'raw'}",
        "step_ms": round(step * 1e3, 2),
        "triplets_per_sec": round(batch / step, 1),
        "batch": batch, "bank_rows": bank_rows,
    }), flush=True)
    return step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--bank", type=int, default=60000)
    p.add_argument("--only", default="", choices=["", "clip", "blip2"])
    args = p.parse_args()

    if args.only in ("", "blip2"):
        for prepare in (False, True):
            bench("blip2_cirr_step", "blip2", {"blip2_size": "pretrain"},
                  32, args.bank, prepare=prepare, repeats=args.repeats)
    if args.only in ("", "clip"):
        for prepare in (False, True):
            bench("clip_rn50x4_step", "clip", {"clip_model_name": "RN50x4"},
                  256, args.bank, prepare=prepare, repeats=args.repeats)


if __name__ == "__main__":
    main()
