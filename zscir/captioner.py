"""Thin CLI wrapper over the shared datagen core. Reference counterpart:
zscir/captioner_llava.py + captioner_blip.py (prompt + it-list contract;
`--mllm blip` runs the JAX BLIP captioner, `--mllm stub` the model-free
fallback). Accepts the reference's own spellings: `--cir_data {fiq,cirr,cc}`
(alias of --dataset), `--k` (alias of --word_num), `--cc_id N` for the CC3M
shards (captioner_llava.py:196-205)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np
from PIL import Image

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.datagen.captioner import (caption_images,
                                           caption_images_batched,
                                           load_caption_checkpoint,
                                           load_cc_shard,
                                           make_blip_captioner,
                                           stub_captioner, write_it_list)

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", "--cir_data", dest="dataset", required=True,
                   choices=["fiq", "cirr", "cc"])
    p.add_argument("--data_path", default="")
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    p.add_argument("--mllm", default="stub", choices=["stub", "blip", "llava"],
                   help="'llava' = JAX LLaVA-v1 (CLIP-L tower + LLaMA, ref "
                        "captioner_llava.py — the canonical path); 'blip' = "
                        "JAX BLIP captioner (ViT + MED LM decoder, ref "
                        "captioner_blip.py); 'stub' = model-free fallback")
    p.add_argument("--ckpt", default="",
                   help="captioner checkpoint (torch; LAVIS blip_caption "
                        "schema for --mllm blip, LlavaLlamaForCausalLM "
                        "state dict for --mllm llava)")
    p.add_argument("--tokenizer_path", default="",
                   help="LLaMA tokenizer dir/file for --mllm llava")
    p.add_argument("--llava_size", default="7b", choices=["7b", "tiny"])
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--mesh_model", type=int, default=0,
                   help="tensor-parallel the LLaVA model over this many "
                        "chips (parallel/tp.py Megatron shards; bf16 7B "
                        "fits from 2x16 GB chips)")
    p.add_argument("--llm_cache", default="",
                   choices=["", "f32", "bf16", "int8"],
                   help="KV cache precision for the LLaVA LM ('' = bf16 at "
                        "7B, f32 at tiny; int8 halves cache bandwidth + "
                        "footprint with per-row scales)")
    p.add_argument("--attn_kernel", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused Pallas decode attention "
                        "(ops/decode_attn.py; decode steps only). 'auto' "
                        "follows the measured production default "
                        "(models/llama.py:DECODE_ATTN_DEFAULT)")
    p.add_argument("--blip_size", default="base")
    p.add_argument("--bert_vocab", default="", help="WordPiece vocab path "
                   "(or SPN4CIR_BERT_VOCAB)")
    p.add_argument("--num_beams", type=int, default=3)
    p.add_argument("--nucleus", action="store_true")
    p.add_argument("--batch_size", type=int, default=0,
                   help="0 (default) = auto: the measured working point for "
                        "the chosen --mllm (llava: 16 @ bf16 KV / 32 @ int8 "
                        "KV per the round-5 A/B, BENCHMARKS.md; blip: 32)")
    p.add_argument("--word_num", "--k", dest="word_num", type=int, default=10)
    p.add_argument("--category", default="image")
    p.add_argument("--cc_id", type=int, default=0,
                   help="CC3M shard id for --cir_data cc (README captions "
                        "shards 0..192 in steps of 32)")
    p.add_argument("--cc_path", default="pretrain_data/cc3m/part_{}.data",
                   help="CC shard path template ('{}' = --cc_id); one JSON "
                        "per line with url/image/caption.en "
                        "(ref data_process.py:42-54)")
    p.add_argument("--caption_ckpt", default="auto",
                   help="preemption resume for the hour-plus 7B jobs: "
                        "finished batches append to this jsonl sidecar "
                        "immediately; a rerun skips them without decoding. "
                        "'auto' = alongside the output, '' = off")
    args = p.parse_args()

    # resolve the output filename early: the resume sidecar sits next to it
    if args.dataset == "cc":
        out_folder, out_name = "zs", (
            f"cc_it_{args.cc_id}_{args.mllm}_{args.word_num}.json")
    else:
        out_folder = args.dataset
        prefix = {"fiq": "fashioniq", "cirr": "cirr"}[args.dataset]
        out_name = f"{prefix}_it_{args.mllm}_{args.word_num}.json"
    if args.caption_ckpt == "auto":
        # the sidecar name carries the checkpoint basename: captions from a
        # DIFFERENT model must not satisfy a resume (same-path re-converts
        # still need --caption_ckpt '' or a deleted sidecar)
        tag = os.path.basename(args.ckpt.rstrip("/")) or "nockpt"
        ckpt_path = os.path.join("mm_data", out_folder,
                                 f".{out_name}.{tag}.partial.jsonl")
    else:
        ckpt_path = args.caption_ckpt
    if ckpt_path:
        os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
    done = load_caption_checkpoint(ckpt_path)
    if done:
        print(f"resuming: {len(done)} captions already in {ckpt_path}")

    if args.dataset == "cc":
        entries = load_cc_shard(args.cc_path.format(args.cc_id))
        remaining = [e for e in entries if e["image_id"] not in done]
    else:
        data_path = args.data_path or (
            "fashionIQ_dataset" if args.dataset == "fiq" else "cirr_dataset")
        ds = CIRDataset(args.dataset, "train", "relative",
                        ImageTransform("targetpad", 224), data_path,
                        args.dress_types.split(",")
                        if args.dataset == "fiq" else None)
        remaining = [n for n in ds.imagenames if n not in done]

    # a fully-resumed run never loads the (multi-GB) model
    transform = batched_fn = None
    if remaining and args.mllm == "llava":
        from spn4cir_tpu.datagen.captioner import make_llava_captioner

        mesh = None
        if args.mesh_model > 1:
            from spn4cir_tpu.parallel.tp import make_model_mesh
            mesh = make_model_mesh(args.mesh_model)
        # load/convert the model ONCE; fiq's per-dress-type prompts ride
        # batched_fn's prompt override (ref captioner_llava.py:173-190)
        cache_dtype = None
        if args.llm_cache:
            import jax.numpy as jnp
            cache_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                           "int8": jnp.int8}[args.llm_cache]
        if args.batch_size == 0:
            # the llava_v1 caption prompt pads to the <=448 bucket
            # (311 prompt + 64 new); pick its measured working point
            from spn4cir_tpu.datagen.llm_rewrite import recommended_llm_batch
            args.batch_size = recommended_llm_batch(448, cache_dtype)
        _, transform, batched_fn = make_llava_captioner(
            args.ckpt, tokenizer_path=args.tokenizer_path,
            llava_size=args.llava_size, category=args.category,
            word_num=args.word_num, max_new_tokens=args.max_new_tokens,
            batch_size=args.batch_size, mesh=mesh, cache_dtype=cache_dtype,
            attn_kernel={"auto": None, "on": True,
                         "off": False}[args.attn_kernel])
    elif remaining and args.mllm == "blip":
        if args.batch_size == 0:
            args.batch_size = 32
        _, transform, batched_fn = make_blip_captioner(
            args.ckpt, blip_size=args.blip_size,
            bert_vocab_path=args.bert_vocab or None,
            use_nucleus_sampling=args.nucleus, num_beams=args.num_beams,
            batch_size=args.batch_size)

    if args.dataset == "cc":
        # one backend-independent pass; entries keep their image_path so
        # get_cir_data's CC mode emits path-carrying triplets
        if not remaining:
            run = []
        elif args.mllm == "stub":
            from spn4cir_tpu.datagen.captioner import caption_prompt

            prompt = caption_prompt(args.category, args.word_num)
            run = [{"image_id": e["image_id"], "caption": stub_captioner(
                np.asarray(Image.open(e["image_path"]).convert("RGB")),
                prompt)} for e in remaining]
        else:
            run = caption_images_batched(
                ((e["image_id"],
                  np.asarray(transform(Image.open(e["image_path"]))))
                 for e in remaining),
                batched_fn, batch_size=args.batch_size,
                checkpoint_path=ckpt_path)
        capmap = dict(done)
        capmap.update({r["image_id"]: r["caption"] for r in run})
        it_list = [{**e, "caption": capmap[e["image_id"]]} for e in entries]
    else:
        remaining_set = set(remaining)
        if args.mllm == "llava":
            import functools

            from spn4cir_tpu.datagen.captioner import caption_prompt

            it_list = []
            groups = ([(dt, dt) for dt in args.dress_types.split(",")]
                      if args.dataset == "fiq" else [(None, args.category)])
            for dress_type, category in groups:
                if not remaining_set:
                    break

                def images():
                    sub = (CIRDataset(args.dataset, "train", "relative",
                                      ImageTransform("targetpad", 224),
                                      data_path, [dress_type])
                           if dress_type is not None else ds)
                    for name, path in zip(sub.imagenames, sub.imagepaths):
                        if name not in remaining_set:  # resume: no decode
                            continue
                        yield name, transform(Image.open(path))

                fn = functools.partial(
                    batched_fn,
                    prompt=caption_prompt(category, args.word_num))
                it_list.extend(caption_images_batched(
                    images(), fn, batch_size=args.batch_size,
                    checkpoint_path=ckpt_path))
        elif args.mllm == "blip":
            def images():
                for name, path in zip(ds.imagenames, ds.imagepaths):
                    if name not in remaining_set:
                        continue
                    yield name, transform(Image.open(path))

            it_list = ([] if not remaining_set else caption_images_batched(
                images(), batched_fn, batch_size=args.batch_size,
                checkpoint_path=ckpt_path))
        else:
            def images():
                for name, path in zip(ds.imagenames, ds.imagepaths):
                    yield name, np.asarray(Image.open(path).convert("RGB"))

            it_list = caption_images(images(), stub_captioner,
                                     category=args.category,
                                     num_words=args.word_num)
        if done:
            have = {it["image_id"] for it in it_list}
            it_list.extend({"image_id": n, "caption": c}
                           for n, c in done.items() if n not in have)
    out = write_it_list(it_list, out_folder, args.mllm, args.word_num,
                        filename=out_name)
    print(f"wrote {len(it_list)} captions -> {out}")
