"""Offline checkpoint conversion CLI: reference .pt/.pth -> framework msgpack.

Usage:
    python tools/convert_ckpt.py --backbone clip --clip-model-name RN50x4 \
        --input models/stage1.pt --output models/stage1.msgpack

Covers the reference's four upstream checkpoint schema families
(SURVEY.md §5 checkpoint row) via spn4cir_tpu.models.convert.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", required=True,
                   choices=["clip", "zs", "tgcir", "blip", "blip2",
                            "llava", "llama"])
    p.add_argument("--quantize_int8", action="store_true",
                   help="llava/llama: weight-only int8 quantize the LM "
                        "host-side (7B: 13.4 -> 6.7 GB on chip)")
    p.add_argument("--clip-model-name", default="RN50x4")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tau", type=float, default=0.02)
    p.add_argument("--init-stage2", action="store_true",
                   help="apply the stage-2 parameter surgery after loading")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from spn4cir_tpu.models import convert
    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.utils.checkpoint import save_model

    if args.backbone in ("llava", "llama"):
        # datagen MLLM checkpoints (captioner_llava.py / llama_generate.py
        # counterparts): LlavaLlamaForCausalLM or HF LlamaForCausalLM
        from spn4cir_tpu.models.llama import LlamaConfig
        from spn4cir_tpu.models.llava import LlavaConfig

        obj = torch.load(args.input, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        if args.backbone == "llava":
            cfg = LlavaConfig.v1_7b()
            params = convert.convert_llava_state_dict(
                sd, cfg.llama.num_layers, cfg.vision.effective_layers)
            if args.quantize_int8:
                params["params"]["language_model"] = \
                    convert.quantize_llama_weights_host(
                        params["params"]["language_model"])
        else:
            cfg = LlamaConfig.llama2_7b_chat()
            params = convert.convert_llama_state_dict(sd, cfg.num_layers)
            if args.quantize_int8:
                params["params"] = convert.quantize_llama_weights_host(
                    params["params"])
        save_model(args.output, params, extra={"source": args.input,
                                               "backbone": args.backbone})
        print(f"wrote {args.output}")
        return

    kw = dict(tau=args.tau)
    if args.backbone in ("clip", "zs", "tgcir"):
        kw["clip_model_name"] = args.clip_model_name
    backbone = build_backbone(args.backbone, **kw)
    template = backbone.init_params(jax.random.PRNGKey(0))

    if args.backbone in ("clip", "zs"):
        params = convert.load_torch_checkpoint(args.input, backbone, template)
    else:
        obj = torch.load(args.input, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        if args.backbone == "blip":
            params = convert.convert_blip_retrieval(
                sd, backbone.vit_cfg.layers, backbone.med_cfg.num_layers,
                tau=args.tau, num_tokens=backbone.vit_cfg.num_tokens)
        elif args.backbone == "blip2":
            params = convert.convert_blip2_cir(
                sd, backbone.vit_cfg.layers, backbone.q_cfg.num_layers,
                tau=args.tau, num_tokens=backbone.vit_cfg.num_tokens)
        else:  # tgcir
            params = convert.convert_tgcir_state_dict(
                sd, backbone.cfg.vision_layers, backbone.cfg.transformer_layers)

    if args.init_stage2 and hasattr(type(backbone), "init_stage2"):
        params = type(backbone).init_stage2(params)

    save_model(args.output, params, extra={"source": args.input,
                                           "backbone": args.backbone})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
