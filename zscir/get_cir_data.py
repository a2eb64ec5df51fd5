"""Thin CLI wrapper over the shared datagen core. Reference counterpart: zscir/get_cir_data.py."""

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

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=["fiq", "cirr"])
    p.add_argument("--data_path", default="")
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    p.add_argument("--it_list", required=True,
                   help="mm_data it-list JSON from the captioner")
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
    p.add_argument("--use_llm", action="store_true")
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
    p.add_argument("--llm_batch", type=int, default=1,
                   help=">1 rewrites in left-padded device batches of this "
                        "size (jax backends; decode at 7B is weight-bound, "
                        "so B prompts cost ~one prompt's HBM traffic)")
    p.add_argument("--mesh_model", type=int, default=0,
                   help="tensor-parallel the jax LM over this many chips "
                        "(Megatron shards via parallel/tp.py; bf16 7B "
                        "fits from 2x16 GB chips, decode rides NxHBM)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    data_path = args.data_path or ("fashionIQ_dataset" if args.dataset == "fiq"
                                   else "cirr_dataset")
    ds = CIRDataset(args.dataset, "train", "relative",
                    ImageTransform("targetpad", 224), data_path,
                    args.dress_types.split(",") if args.dataset == "fiq" else None)
    name2cap = load_it_list(args.it_list)
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
        if args.llm_backend == "hf":
            from spn4cir_tpu.datagen.llm_rewrite import load_hf_rewriter
            rewriter = load_hf_rewriter(data=args.dataset)
        else:
            from spn4cir_tpu.datagen.llm_rewrite import load_jax_rewriter
            tok = None
            if args.llm_tokenizer:
                from transformers import AutoTokenizer
                tok = AutoTokenizer.from_pretrained(args.llm_tokenizer)
            mesh = None
            if args.mesh_model > 1:
                import jax

                from spn4cir_tpu.parallel.tp import make_tp_mesh
                mesh = make_tp_mesh(
                    data=1, model=args.mesh_model,
                    devices=jax.devices()[:args.mesh_model])
            rewriter = load_jax_rewriter(
                args.llm_ckpt, tok, data=args.dataset,
                tiny=(args.llm_backend == "jax-tiny"), seed=args.seed,
                batch_size=args.llm_batch, mesh=mesh)
    triplets = generate_extended_triplets(
        ds, name2cap, k=args.k, total_cap=args.K,
        prompt_ids=[int(x) for x in args.p_list.split(",")],
        refer_only=args.refer, i2i_ranks=i2i_ranks,
        rank_lo=args.i2i_rank, rank_hi=args.i2i_rank_max,
        llm_rewrite=rewriter, seed=args.seed)
    out = write_extended_triplets(ds, triplets, args.model, llm=args.use_llm)
    print(f"wrote {len(triplets)} extended triplets -> {out}")
