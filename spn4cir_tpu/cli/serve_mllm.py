"""MLLM captioning service launcher.

Replaces the reference's LLaVA controller/worker REST stack
(`zscir/llava/serve/{controller,model_worker}.py`) with the framework's
single-process-per-chip serving model (serve/mllm.py): load the captioner
once, micro-batch concurrent HTTP requests into compiled device dispatches.

    python -m spn4cir_tpu.cli.serve_mllm --mllm llava --ckpt <llava.pt> \
        --tokenizer_path <llama-tokenizer-dir> --port 8081
    curl -s localhost:8081/caption -d '{"image_b64": "..."}'
"""

from __future__ import annotations

import argparse
from typing import Optional


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--mllm", default="llava", choices=["llava", "blip"])
    p.add_argument("--ckpt", default="",
                   help="checkpoint (torch state dict or converted); empty "
                        "= random init (smoke runs only)")
    p.add_argument("--tokenizer_path", default="",
                   help="HF LLaMA tokenizer dir (llava)")
    p.add_argument("--llava_size", default="7b", choices=["7b", "tiny"])
    p.add_argument("--blip_size", default="base")
    p.add_argument("--bert_vocab", default="",
                   help="WordPiece vocab path (blip)")
    p.add_argument("--category", default="image",
                   help="default-prompt subject (llava only)")
    p.add_argument("--word_num", type=int, default=10,
                   help="default-prompt word budget (llava only)")
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=16,
                   help="device batch (= micro-batch coalescing cap). 16 = "
                        "the round-5 bf16-KV working point (BENCHMARKS.md: "
                        "fused decode attention makes B=16 +23%% captions/s "
                        "over B=8; requests still dispatch after "
                        "--max_delay_ms, so light load keeps B small)")
    p.add_argument("--max_delay_ms", type=float, default=20.0,
                   help="max time a request waits for batch-mates")
    p.add_argument("--quantize_int8", action="store_true",
                   help="weight-only int8 LM (llava; halves weight HBM)")
    p.add_argument("--mesh_model", type=int, default=0,
                   help="tensor-parallel the model over this many chips")
    p.add_argument("--llm_cache", default="",
                   choices=["", "f32", "bf16", "int8"],
                   help="KV cache precision for the LLaVA LM ('' = bf16 at "
                        "7B, f32 at tiny)")
    p.add_argument("--attn_kernel", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused Pallas decode attention "
                        "(ops/decode_attn.py; decode steps only). 'auto' "
                        "follows the measured production default — one "
                        "decode configuration for serving AND batch "
                        "datagen (zscir/captioner.py)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8081)
    p.add_argument("--no-block", dest="block", action="store_false",
                   default=True, help="return the server (tests)")
    args = p.parse_args(argv)

    from spn4cir_tpu.datagen.captioner import caption_prompt
    from spn4cir_tpu.serve.mllm import CaptionService, serve_captions

    if args.mllm == "blip" and (args.quantize_int8 or args.mesh_model > 1):
        raise SystemExit("--quantize_int8/--mesh_model apply to the LLaVA "
                         "backend only (BLIP-base fits any chip in full "
                         "precision)")
    mesh = None
    if args.mesh_model > 1:
        from spn4cir_tpu.parallel.tp import make_model_mesh
        mesh = make_model_mesh(args.mesh_model)

    if args.mllm == "llava":
        from spn4cir_tpu.datagen.captioner import make_llava_captioner

        cache_dtype = None
        if args.llm_cache:
            import jax.numpy as jnp
            cache_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                           "int8": jnp.int8}[args.llm_cache]
        _, transform, batched_fn = make_llava_captioner(
            args.ckpt, tokenizer_path=args.tokenizer_path,
            llava_size=args.llava_size, category=args.category,
            word_num=args.word_num, max_new_tokens=args.max_new_tokens,
            batch_size=args.batch_size, quantize_weights=args.quantize_int8,
            mesh=mesh, cache_dtype=cache_dtype,
            attn_kernel={"auto": None, "on": True,
                         "off": False}[args.attn_kernel])
    else:
        from spn4cir_tpu.datagen.captioner import make_blip_captioner

        _, transform, batched_fn = make_blip_captioner(
            args.ckpt, blip_size=args.blip_size,
            bert_vocab_path=args.bert_vocab or None,
            max_length=args.max_new_tokens,
            batch_size=args.batch_size)

    # BLIP's batched_fn has no prompt parameter (fixed "a picture of"
    # decoder prompt — ref captioner_blip.py); only LLaVA takes per-request
    # prompt overrides
    default_prompt = (caption_prompt(args.category, args.word_num)
                      if args.mllm == "llava" else None)
    service = CaptionService(
        batched_fn, transform, model_name=args.mllm,
        max_batch=args.batch_size, max_delay_s=args.max_delay_ms / 1000.0,
        default_prompt=default_prompt,
        supports_prompt=(args.mllm == "llava"))
    server = serve_captions(service, args.host, args.port)
    print(f"caption service ({args.mllm}) on {args.host}:{args.port}",
          flush=True)
    if args.block:
        import threading
        threading.Event().wait()
    return server, service


if __name__ == "__main__":
    main()
