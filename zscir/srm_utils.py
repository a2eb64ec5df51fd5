"""Thin CLI wrapper over the shared datagen core. Reference counterpart: zscir/srm_utils.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import numpy as np

from spn4cir_tpu.data.datasets import CIRDataset, iter_unique_images
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.datagen.srm import compute_sims, save_srm, srm_scores
from spn4cir_tpu.models.api import build_backbone

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=["fiq", "cirr"])
    p.add_argument("--data_path", default="")
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    p.add_argument("--clip-model-name", default="ViT-L/14")
    p.add_argument("--model_path", default="")
    p.add_argument("--out", default="srm.npz")
    p.add_argument("--sims_out", default="sims.npz")
    p.add_argument("--k_negatives", type=int, default=1000)
    args = p.parse_args()
    data_path = args.data_path or ("fashionIQ_dataset" if args.dataset == "fiq"
                                   else "cirr_dataset")
    bb = build_backbone("clip", clip_model_name=args.clip_model_name)
    params = bb.init_params(jax.random.PRNGKey(0))
    if args.model_path:
        from spn4cir_tpu.models import convert
        params = convert.load_torch_checkpoint(args.model_path, bb, params)
    tf = ImageTransform("targetpad", bb.input_dim)
    ds = CIRDataset(args.dataset, "train", "relative", tf, data_path,
                    args.dress_types.split(",") if args.dataset == "fiq" else None)
    enc = jax.jit(lambda im: bb.gallery_features(params, im))
    feats = np.zeros((ds.num_unique_images, bb.embed_dim), np.float32)
    for ids, images in iter_unique_images(ds, 32):
        out = jax.device_get(enc(images))
        valid = ids >= 0
        feats[ids[valid]] = out[valid]
    texts = [ds.caption_for(i, train=False) for i in range(len(ds.triplets))]
    tfeats = np.zeros((len(texts), bb.embed_dim), np.float32)
    for s in range(0, len(texts), 64):
        chunk = texts[s : s + 64]
        import jax.numpy as jnp
        from spn4cir_tpu.ops.infonce import l2_normalize
        ids = jnp.asarray(bb.tokenize(chunk))
        tfeats[s : s + len(chunk)] = jax.device_get(
            l2_normalize(bb.encode_text(params, ids).astype(jnp.float32)))
    # (uses CLIP for both cross- and intra-modal roles; plug Unicom/BGE
    #  features in via datagen.srm directly if those assets are available)
    sims = compute_sims(feats, tfeats, feats, tfeats)
    np.savez_compressed(args.sims_out, **sims)
    refer = np.array([ds.imagename2id[t["reference_name"]] for t in ds.triplets])
    target = np.array([ds.imagename2id[t["target_name"]] for t in ds.triplets])
    save_srm(args.out, srm_scores(sims, refer, target, args.k_negatives))
    print(f"wrote {args.sims_out} and {args.out}")
