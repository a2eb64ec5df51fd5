"""Shared CLI plumbing: the reference's canonical argparse surface
(`clip4cir/train.py:200-230`), reproduced once and reused by every
per-backbone entry point so README recipes port verbatim (SURVEY.md §7
decision 2)."""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.models.api import CIRBackbone, build_backbone


def base_parser(default_model: str = "RN50x4", default_tau: float = 0.02,
                default_lr: float = 2e-5, default_bs: int = 256,
                default_epochs: int = 5) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True, choices=["fiq", "cirr"])
    p.add_argument("--num-epochs", default=default_epochs, type=int)
    p.add_argument("--clip-model-name", default=default_model, type=str)
    p.add_argument("--learning-rate", default=default_lr, type=float)
    p.add_argument("--batch-size", default=default_bs, type=int)
    p.add_argument("--validation-frequency", default=1, type=int)
    p.add_argument("--target-ratio", default=1.25, type=float)
    p.add_argument("--transform", default="targetpad", type=str,
                   choices=["clip", "squarepad", "targetpad"])
    p.add_argument("--output_path", default="")
    p.add_argument("--tau", default=default_tau, type=float)
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    p.add_argument("--grad_ckpt", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--data_path", default="")
    p.add_argument("--use_bank", action="store_true")
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--reload_bank", action="store_true")
    p.add_argument("--device", default="0")  # accepted for parity; unused on TPU
    p.add_argument("--bank_path", default="")
    p.add_argument("--nni", action="store_true")
    p.add_argument("--plus", action="store_true")
    p.add_argument("--neg_num", type=int, default=-1)
    p.add_argument("--llmcap", action="store_true")
    p.add_argument("--wo_bank", action="store_true")
    p.add_argument("--fiq_val_type", type=int, default=0, choices=[0, 1],
                   help="FIQ gallery: 0=original image_splits list, 1=VAL-set "
                        "images only (ref clip4cir/validate.py:247, "
                        "data_utils.py:300-310)")
    p.add_argument("--val_ret_train", action="store_true",
                   help="val relative mode returns (ref, cap, tgt) image "
                        "triplets for retrieval-on-train analysis (ref "
                        "data_utils.py:276-285)")
    # TPU-native extensions
    p.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    p.add_argument("--text_max_len", type=int, default=0,
                   help="BLIP text token budget (0 = backbone default 35; "
                        "the reference pads to the longest caption — raise "
                        "this if captions exceed 33 WordPiece tokens)")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="train-mode dropout on the BLIP/BLIP-2 MED text side "
                        "(the reference trains with HF BERT dropout 0.1; 0.0 "
                        "matches eval parity)")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-axis size (0 = all devices)")
    p.add_argument("--mesh_bank", type=int, default=1, help="bank-axis size")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel axis for gallery/bank indexing "
                        "(Megatron-style tower sharding, parallel/tp.py)")
    p.add_argument("--loss_impl", default="auto",
                   choices=["auto", "pallas", "xla"])
    # ablation flags (ref clip4cir/train_negtype.py / train_negplus.py)
    p.add_argument("--neg_type", type=int, default=0,
                   help="negtype ablation bitmask 1-15 (stage-1 only)")
    p.add_argument("--unlabeled", action="store_true",
                   help="extend the target bank with unlabeled negatives")
    p.add_argument("--use_cc", action="store_true",
                   help="zscir: train on out-of-domain CC triplets")
    p.add_argument("--loader_procs", type=int, default=0,
                   help="decode with N worker PROCESSES x native C++ "
                        "threads (data/mploader.py) for the gallery/bank "
                        "image scans — the production-rate input pipeline "
                        "(0 = in-process thread pool)")
    p.add_argument("--device_preprocess", action="store_true",
                   help="run resize/crop/normalize ON THE CHIP fused with "
                        "the encoder (ops/preprocess.py): the host only "
                        "decodes + pastes into uint8 canvases. Applies to "
                        "the gallery/bank/serving image scans; cuts the "
                        "host-core budget by the bicubic-resize share")
    p.add_argument("--device_canvas", type=int, default=0,
                   help="staging canvas side for --device_preprocess "
                        "(0 = 2x the backbone input dim); images whose "
                        "padded extent exceeds it are host-downscaled first")
    p.add_argument("--profile_dir", default="",
                   help="write a jax profiler trace of the train loop here")
    p.add_argument("--resume", action="store_true",
                   help="save/restore full training state (orbax); restores "
                        "to the exact epoch+step of the latest checkpoint")
    p.add_argument("--ckpt_every_steps", type=int, default=0,
                   help="with --resume: ALSO checkpoint every N optimizer "
                        "steps (async), so a preemption mid-epoch loses at "
                        "most N steps — matters for live-encode stage-1 "
                        "epochs (0 = epoch boundaries only)")
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine", "linear"])
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--bank_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="device dtype of the target bank (bf16 halves the "
                        "bank-loss HBM traffic; int8 per-row-absmax "
                        "quantization halves it again — 2D and 3D fusion "
                        "banks, single-chip or mesh; full-bank loss only; "
                        "logits still accumulate f32)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() before any "
                        "backend use (or set SPN4CIR_DIST_* env vars)")
    return p


def finalize_args(args) -> None:
    if getattr(args, "loader_procs", 0):
        import os

        os.environ["SPN4CIR_MP_PROCS"] = str(args.loader_procs)
    if args.data_path == "":
        args.data_path = ("fashionIQ_dataset" if args.dataset == "fiq"
                          else "cirr_dataset")
    if isinstance(args.dress_types, str):
        args.dress_types = args.dress_types.split(",")
    if args.nni:
        try:
            import nni

            for k, v in (nni.get_next_parameter() or {}).items():
                setattr(args, k.replace("-", "_"), v)
        except ImportError:
            print("[warn] --nni requested but nni is not installed; ignoring")
    print("Arguments:")
    for k, v in sorted(vars(args).items()):
        print("    ", k, ":", v)


def make_backbone(name: str, args) -> CIRBackbone:
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    kw = dict(tau=args.tau, dtype=dtype, remat=bool(args.grad_ckpt))
    if getattr(args, "text_max_len", 0) and name == "blip":
        kw["text_max_len"] = args.text_max_len
    if getattr(args, "dropout", 0.0):
        if name in ("blip", "blip2"):
            kw["dropout"] = args.dropout
        else:
            print(f"[warn] --dropout ignored for the {name} backbone "
                  "(the reference's CLIP towers have no dropout)")
    if name in ("clip", "zs", "tgcir"):
        kw["clip_model_name"] = args.clip_model_name
    elif name == "blip":
        # --clip-model-name doubles as the BLIP size (base/large/test-tiny)
        kw["blip_size"] = (args.clip_model_name
                           if args.clip_model_name in ("base", "large", "test-tiny")
                           else "base")
    elif name == "blip2":
        kw["blip2_size"] = (args.clip_model_name
                            if args.clip_model_name in ("pretrain", "test-tiny")
                            else "pretrain")
    return build_backbone(name, **kw)


def make_transform(backbone: CIRBackbone, args):
    """The host preprocess (ImageTransform), or the raw staging half of the
    split device preprocess under --device_preprocess (RawStageTransform —
    iterators then yield uint8 canvases and the chip runs resize/crop/
    normalize fused with the encoder)."""
    if getattr(args, "device_preprocess", False):
        from spn4cir_tpu.data.transforms import RawStageTransform

        canvas = getattr(args, "device_canvas", 0) or 2 * backbone.input_dim
        return RawStageTransform(args.transform, backbone.input_dim, canvas,
                                 args.target_ratio)
    return ImageTransform(args.transform, backbone.input_dim, args.target_ratio)


def load_or_init_params(backbone: CIRBackbone, args, seed_key):
    """--model_path loads a converted checkpoint (stage-1 weights,
    ref `load_ckpt` `clip4cir/models.py:58-63`); otherwise random init."""
    params = backbone.init_params(seed_key)
    if args.model_path:
        from spn4cir_tpu.utils.checkpoint import load_model
        from spn4cir_tpu.models import convert

        if args.model_path.endswith((".pt", ".pth")):
            params = convert.load_torch_checkpoint(
                args.model_path, backbone, params)
        else:
            params, _ = load_model(args.model_path, params)
    return params


def resolve_output_path(args, backbone_name: str) -> str:
    if args.debug:
        out = os.path.join("models", "debug")
    elif args.output_path:
        out = args.output_path
    else:
        import datetime

        stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
        out = os.path.join("models", f"{args.dataset}_{backbone_name}_{stamp}")
    os.makedirs(out, exist_ok=True)
    return out
