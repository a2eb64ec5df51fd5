"""Thin CLI wrapper over the shared datagen core. Reference counterpart:
zscir/get_cir_data.py. Accepts the reference's own spellings: `--data
{fiq,cirr,ccfiq,cccirr}` (alias of --dataset; the cc* values build the
out-of-domain CC3M triplets, ref get_cc :180-223), `--mllm`/`--word_num`
resolve the default it-list filename (mm_data/{ds}/..._it_{mllm}_{k}.json,
ref :36,110,191) when --it_list is not given."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json

import numpy as np

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.datagen.generate import (
    generate_extended_triplets, load_it_list, write_extended_triplets)


def _llm_cache_dtype(name: str):
    """'' -> None (load_jax_rewriter's size-based default)."""
    if not name:
        return None
    import jax.numpy as jnp

    return {"f32": jnp.float32, "bf16": jnp.bfloat16,
            "int8": jnp.int8}[name]


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", "--data", dest="dataset", required=True,
                   choices=["fiq", "cirr", "ccfiq", "cccirr"])
    p.add_argument("--data_path", default="")
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    p.add_argument("--it_list", default="",
                   help="mm_data it-list JSON from the captioner; empty = "
                        "the reference's default filename from "
                        "--mllm/--word_num (comma-separated or glob for "
                        "the CC shards)")
    p.add_argument("--mllm", default="llava",
                   choices=["blip", "blip2", "llava", "stub"])
    p.add_argument("--word_num", type=int, default=10)
    p.add_argument("--model", default="zs", help="filename tag (clip/tgcir/...)")
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--K", type=int, default=0, help="total cap")
    p.add_argument("--p_list", default="0", help="comma prompt ids 0-2")
    p.add_argument("--refer", action="store_true")
    p.add_argument("--i2i_rank", type=int, default=-1)
    p.add_argument("--i2i_rank_max", type=int, default=-1)
    p.add_argument("--srm", default="",
                   help="alias for --sims (an npz with an 'i2i' matrix, e.g."
                        " srm_utils --sims_out)")
    p.add_argument("--sims", default="", help="sims npz with an 'i2i' matrix")
    p.add_argument("--use_llm", type=int, nargs="?", const=1, default=0,
                   help="LLaMA-2 rewriting; the value is the reference's "
                        "llm_type (1 = few-shot chat prompt, 2 = plain "
                        "template — get_cir_data.py:95,170). Bare "
                        "--use_llm means 1.")
    p.add_argument("--llm_backend", default="jax",
                   choices=["jax", "hf", "jax-tiny"],
                   help="'jax' = TPU-native LLaMA decoder (needs "
                        "--llm_ckpt + --llm_tokenizer); 'hf' = the "
                        "reference's torch pipeline; 'jax-tiny' = "
                        "random-init tiny JAX LM (smoke runs)")
    p.add_argument("--llm_ckpt", default="",
                   help="HF LlamaForCausalLM torch state dict for "
                        "--llm_backend jax")
    p.add_argument("--llm_tokenizer", default="",
                   help="LLaMA tokenizer dir for --llm_backend jax")
    p.add_argument("--llm_batch", type=int, default=0,
                   help="0 (default) = bucket-aware auto batching at the "
                        "measured per-bucket working points (DECODE_BUCKET_"
                        "BATCH, BENCHMARKS.md round 5); >1 = fixed "
                        "left-padded device batches; 1 = one prompt per "
                        "generate (the reference's loop)")
    p.add_argument("--mesh_model", type=int, default=0,
                   help="tensor-parallel the jax LM over this many chips "
                        "(Megatron shards via parallel/tp.py; bf16 7B "
                        "fits from 2x16 GB chips, decode rides NxHBM)")
    p.add_argument("--llm_cache", default="",
                   choices=["", "f32", "bf16", "int8"],
                   help="KV cache precision for the jax LM ('' = bf16 at "
                        "7B, f32 at tiny; int8 halves cache bandwidth + "
                        "footprint with per-row scales)")
    p.add_argument("--prefill_chunk", type=int, default=128,
                   help="prefill the prompt in fixed-size chunks (caps the "
                        "B x H x P^2 attention-logit working set so "
                        "--llm_batch 16+ fits; +4.5%% at B=8 on hardware; "
                        "0 = dense one-shot prefill)")
    p.add_argument("--attn_kernel", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused Pallas decode attention for the jax LM "
                        "(ops/decode_attn.py; decode steps only). 'auto' "
                        "follows the measured production default "
                        "(models/llama.py:DECODE_ATTN_DEFAULT)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    use_cc = args.dataset.startswith("cc")
    base = args.dataset[2:] if use_cc else args.dataset
    data_path = args.data_path or ("fashionIQ_dataset" if base == "fiq"
                                   else "cirr_dataset")
    if use_cc:
        # CC partners sample uniformly (ref get_cc :199-205); fail loud
        # rather than silently discard the SRM rank window / refer filter
        if args.refer or args.i2i_rank >= 0:
            raise SystemExit("--refer/--i2i_rank do not apply to the CC "
                             "modes (out-of-domain partners sample "
                             "uniformly, ref get_cir_data.py:199-205)")
        # CC shard it-lists (captioner --cir_data cc output); default: every
        # shard matching the reference filename shape
        import glob

        pats = (args.it_list.split(",") if args.it_list else
                [f"mm_data/zs/cc_it_*_{args.mllm}_{args.word_num}.json"])
        paths = sorted(p_ for pat in pats for p_ in glob.glob(pat))
        if not paths:
            raise SystemExit(f"no CC it-lists found for {pats} — run "
                             "zscir/captioner.py --cir_data cc first")
        cc_items = []
        for path in paths:
            with open(path) as f:
                cc_items.extend(json.load(f))
    else:
        ds = CIRDataset(base, "train", "relative",
                        ImageTransform("targetpad", 224), data_path,
                        args.dress_types.split(",") if base == "fiq" else None)
        it_path = args.it_list or os.path.join(
            "mm_data", base,
            f"{'fashioniq' if base == 'fiq' else 'cirr'}"
            f"_it_{args.mllm}_{args.word_num}.json")
        name2cap = load_it_list(it_path)
    i2i_ranks = None
    sims_path = args.sims or args.srm
    if args.i2i_rank >= 0 and sims_path:
        data = np.load(sims_path)
        if "i2i" not in data:
            raise SystemExit(f"{sims_path} has no 'i2i' matrix — pass the "
                             "srm_utils --sims_out file")
        i2i_ranks = np.argsort(-data["i2i"], axis=1)
    elif args.i2i_rank >= 0:
        raise SystemExit("--i2i_rank needs --sims/--srm (an npz with 'i2i')")
    rewriter = None
    if args.use_llm:
        # the reference composes the LM input differently per dataset:
        # fiq rewrites caption2 alone (mod_type=1), cirr the "{1} instead
        # of {0}" composition (mod_type=0) — get_cir_data.py:94,169
        mod_type = 1 if base == "fiq" else 0
        llm_type = int(args.use_llm)
        if args.llm_backend == "hf":
            from spn4cir_tpu.datagen.llm_rewrite import load_hf_rewriter
            rewriter = load_hf_rewriter(data=base, mod_type=mod_type,
                                        llm_type=llm_type)
        else:
            from spn4cir_tpu.datagen.llm_rewrite import load_jax_rewriter
            tok = None
            if args.llm_tokenizer:
                from transformers import AutoTokenizer
                tok = AutoTokenizer.from_pretrained(args.llm_tokenizer)
            mesh = None
            if args.mesh_model > 1:
                from spn4cir_tpu.parallel.tp import make_model_mesh
                mesh = make_model_mesh(args.mesh_model)
            rewriter = load_jax_rewriter(
                args.llm_ckpt, tok, data=base, mod_type=mod_type,
                llm_type=llm_type,
                tiny=(args.llm_backend == "jax-tiny"), seed=args.seed,
                batch_size=args.llm_batch, mesh=mesh,
                prefill_chunk=args.prefill_chunk or None,
                cache_dtype=_llm_cache_dtype(args.llm_cache),
                attn_kernel={"auto": None, "on": True,
                             "off": False}[args.attn_kernel])
    prompt_ids = [int(x) for x in args.p_list.split(",")]
    if use_cc:
        from spn4cir_tpu.datagen.generate import (generate_cc_triplets,
                                                  write_cc_triplets)

        triplets = generate_cc_triplets(
            cc_items, base, k=args.k, prompt_ids=prompt_ids,
            total_cap=args.K, llm_rewrite=rewriter, seed=args.seed)
        out = write_cc_triplets(data_path, base, triplets)
    else:
        triplets = generate_extended_triplets(
            ds, name2cap, k=args.k, total_cap=args.K,
            prompt_ids=prompt_ids,
            refer_only=args.refer, i2i_ranks=i2i_ranks,
            rank_lo=args.i2i_rank, rank_hi=args.i2i_rank_max,
            llm_rewrite=rewriter, seed=args.seed)
        out = write_extended_triplets(ds, triplets, args.model,
                                      llm=args.use_llm)
    print(f"wrote {len(triplets)} triplets -> {out}")
