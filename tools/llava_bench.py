"""LLaVA captioner throughput on the chip at production geometry.

Measures the three phases of the captioning pipeline (zscir/captioner_llava
parity path) with random bf16 weights created ON DEVICE (7B f32 init would
not fit host or HBM; throughput is weight-value independent):

  1. vision encode: CLIP ViT-L/14@224 tower (23 effective layers) +
     projector, img/s;
  2. prompt prefill: the KV-cached scan consuming P prompt+image positions;
  3. decode: steady-state ms/token from the same scan's tail.

Reports captions/s/chip for the reference's working point (the FIQ prompt
~55 text tokens + 256 image tokens, ~15-40 generated tokens at T=0.01).

Run: python tools/llava_bench.py [--size 7b|tiny] [--batch 8]
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
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


def random_params_like(tree, dtype=jnp.bfloat16, scale=0.02):
    """Device-side random params from an eval_shape tree (no host copy).
    Integer leaves (int8 QuantKernel values) fill with random int8; float
    leaves with normal*scale in `dtype` (f32 for scale vectors)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(jax.random.PRNGKey(0), len(leaves))

    outs = []
    for k, leaf in zip(keys, leaves):
        shape = leaf.shape
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            outs.append(jax.jit(lambda key, s=shape: jax.random.randint(
                key, s, -127, 128, jnp.int32).astype(jnp.int8))(k))
        elif leaf.dtype == jnp.float32:
            outs.append(jax.jit(lambda key, s=shape: jnp.abs(
                jax.random.normal(key, s, jnp.float32)) * (scale / 127))(k))
        else:
            outs.append(jax.jit(
                lambda key, s=shape: jax.random.normal(key, s, dtype) * scale
            )(k))
    return jax.tree_util.tree_unflatten(treedef, outs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="7b", choices=["7b", "tiny"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt_text", type=int, default=55,
                   help="text tokens in the prompt (55 ~ llava_v1 FIQ)")
    p.add_argument("--new_tokens", type=int, default=32)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--cache_dtype", default="bf16",
                   choices=["f32", "bf16", "int8"],
                   help="KV cache precision (int8: per-row scales, halves "
                        "cache bandwidth + footprint)")
    p.add_argument("--attn_kernel", default="off",
                   choices=["on", "off"],
                   help="fused Pallas decode attention (ops/decode_attn.py)"
                        " — decode steps only; pads the cache to a lane"
                        " multiple")
    p.add_argument("--quant_kernel", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused int8 Pallas matmul (ops/quant_matmul.py), DECODE steps only — prefill always uses the XLA path; auto = OFF (lost the round-4 hardware A/B)")
    p.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                   help="int8 = weight-only quantized LM (halves weight "
                        "HBM: 13.4 -> 6.7 GB at 7B; decode is weight-"
                        "bandwidth-bound, so also ~2x decode)")
    args = p.parse_args()

    from spn4cir_tpu.models.llama import LlamaLM, llama_generate
    from spn4cir_tpu.models.llava import (LlavaConfig, LlavaVisionTower)

    cfg = LlavaConfig.v1_7b() if args.size == "7b" else LlavaConfig.tiny()
    v = cfg.vision
    B = args.batch

    # --- vision tower + projector ---
    tower = LlavaVisionTower(v, jnp.bfloat16)
    vshapes = jax.eval_shape(
        lambda k: tower.init(k, jnp.zeros((1, v.image_size, v.image_size, 3),
                                          jnp.bfloat16)),
        jax.random.PRNGKey(0))
    vparams = random_params_like(vshapes)
    images = jax.jit(lambda k: jax.random.uniform(
        k, (B, v.image_size, v.image_size, 3), jnp.bfloat16))(
        jax.random.PRNGKey(1))
    proj = jax.jit(lambda k: jax.random.normal(
        k, (v.width, cfg.llama.hidden_size), jnp.bfloat16) * 0.02)(
        jax.random.PRNGKey(2))

    @jax.jit
    def encode(vp, pr, im):
        return tower.apply(vp, im) @ pr

    feats = encode(vparams, proj, images)
    force(feats)
    t0 = time.monotonic()
    for _ in range(args.repeats):
        feats = encode(vparams, proj, images)
    force(feats)
    t_enc = (time.monotonic() - t0) / args.repeats
    print(json.dumps({"metric": "llava_vision_encode",
                      "images_per_sec": round(B / t_enc, 1),
                      "batch": B}), flush=True)

    # --- LM generate (prompt = text + image tokens, then decode) ---
    lshapes = jax.eval_shape(
        lambda k: LlamaLM(cfg.llama).init(
            k, input_ids=jnp.zeros((1, 4), jnp.int32)),
        jax.random.PRNGKey(0))
    if args.weights == "int8":
        # build the QUANTIZED structure directly (random int8 + scales):
        # quantizing real bf16 weights in-place needs both copies resident
        # (20 GB transient at 7B); real checkpoints quantize host-side in
        # the converter path instead
        from spn4cir_tpu.models.llama import quantize_llama_weights

        qshapes = jax.eval_shape(quantize_llama_weights, lshapes["params"])
        lparams = random_params_like(qshapes)
    else:
        lparams = random_params_like(lshapes)["params"]
    prompt_len = args.prompt_text + v.num_patches
    embeds = jax.jit(lambda k: jax.random.normal(
        k, (B, prompt_len, cfg.llama.hidden_size), jnp.bfloat16) * 0.02)(
        jax.random.PRNGKey(3))

    qk = {"auto": None, "on": True, "off": False}[args.quant_kernel]
    cdt = {"f32": jnp.float32, "bf16": jnp.bfloat16,
           "int8": jnp.int8}[args.cache_dtype]
    gen = jax.jit(lambda p, e, r: llama_generate(
        p, cfg.llama, e, eos_id=2, pad_id=2,
        max_new_tokens=args.new_tokens, do_sample=True, temperature=0.01,
        top_p=0.01, cache_dtype=cdt, rng=r, quant_kernel=qk,
        attn_kernel=args.attn_kernel == "on"))
    out = gen(lparams, embeds, jax.random.PRNGKey(4))
    force(out)
    times = []
    for _ in range(args.repeats):
        t0 = time.monotonic()
        out = gen(lparams, embeds, jax.random.PRNGKey(5))
        force(out)
        times.append(time.monotonic() - t0)
    t_gen = min(times)
    total_steps = prompt_len + args.new_tokens - 1
    per_tok = t_gen / total_steps
    captions_per_sec = B / (t_enc + t_gen)
    print(json.dumps({
        "metric": "llava_generate",
        "batch": B, "prompt_len": prompt_len,
        "new_tokens": args.new_tokens,
        "seconds": round(t_gen, 3),
        "ms_per_position": round(per_tok * 1e3, 2),
        "captions_per_sec_per_chip": round(captions_per_sec, 2),
        "weights": args.weights,
        "cache_dtype": args.cache_dtype,
        "attn_kernel": args.attn_kernel,
    }), flush=True)


if __name__ == "__main__":
    main()
