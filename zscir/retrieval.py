"""Thin CLI wrapper over the shared core. Reference counterpart: zscir/retrieval.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax

from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.eval.generic_retrieval import (
    encode_paths, export_results, i2i_topk, list_images, t2i_topk)
from spn4cir_tpu.models.api import build_backbone

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", required=True, help="dir / JSON list / CSV of images")
    p.add_argument("--query", default="", help="query images (defaults to gallery i2i)")
    p.add_argument("--text", default="", help="comma-separated text queries (t2i)")
    p.add_argument("--clip-model-name", default="ViT-L/14")
    p.add_argument("--model_path", default="")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--out_dir", default="retrieval_results")
    args = p.parse_args()
    bb = build_backbone("clip", clip_model_name=args.clip_model_name)
    params = bb.init_params(jax.random.PRNGKey(0))
    if args.model_path:
        from spn4cir_tpu.models import convert
        params = convert.load_torch_checkpoint(args.model_path, bb, params)
    tf = ImageTransform("clip", bb.input_dim)
    gallery_paths = list_images(args.gallery)
    gallery = encode_paths(bb, params, gallery_paths, tf)
    if args.text:
        top = t2i_topk(bb, params, args.text.split(","), gallery, args.topk)
        export_results([], gallery_paths, top, args.out_dir)
    else:
        qpaths = list_images(args.query) if args.query else gallery_paths
        qfeats = (encode_paths(bb, params, qpaths, tf)
                  if args.query else gallery)
        top = i2i_topk(qfeats, gallery, args.topk,
                       exclude_self=not args.query)
        export_results(qpaths, gallery_paths, top, args.out_dir)
    print(f"wrote results for {top.shape[0]} queries to {args.out_dir}")
