"""Thin CLI wrapper over the shared datagen core. Reference counterpart:
zscir/srm_utils.py — extracts SRM (Unicom ViT-L/14 + BGE-base-en,
ref :35-69) and CLIP ViT-L/14 (ref :102-106) features for all train
images/captions, computes the four similarity matrices (ref :119-131), and
emits per-triplet rank scores + top-K hard negatives (ref :142-183)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.data.datasets import CIRDataset, iter_unique_images
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.datagen.srm import compute_sims, save_srm, srm_scores
from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.ops.infonce import l2_normalize


def encode_images(ds, encode_fn, num_images, dim, batch_size):
    feats = np.zeros((num_images, dim), np.float32)
    for ids, images in iter_unique_images(ds, batch_size):
        out = jax.device_get(encode_fn(images))
        valid = ids >= 0
        feats[ids[valid]] = out[valid]
    return feats


def encode_texts(texts, encode_fn, dim, chunk=64):
    feats = np.zeros((len(texts), dim), np.float32)
    for s in range(0, len(texts), chunk):
        part = texts[s: s + chunk]
        feats[s: s + len(part)] = jax.device_get(encode_fn(part))
    return feats


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=["fiq", "cirr"])
    p.add_argument("--data_path", default="")
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    p.add_argument("--clip-model-name", dest="clip_model_name",
                   default="ViT-L/14")
    p.add_argument("--model_path", default="", help="CLIP ckpt (cross-modal role)")
    p.add_argument("--unicom_ckpt", default="",
                   help="Unicom FP16-ViT-L-14.pt (intra-modal image role, "
                        "ref srm_utils.py:37-43)")
    p.add_argument("--bge_ckpt", default="",
                   help="BAAI/bge-base-en BertModel save (intra-modal text "
                        "role, ref srm_utils.py:38-46)")
    p.add_argument("--bert_vocab", default="", help="bert-base-uncased vocab")
    p.add_argument("--allow_clip_srm", action="store_true",
                   help="substitute CLIP features for the SRM roles when the "
                        "Unicom/BGE checkpoints are unavailable")
    p.add_argument("--tiny_srm", action="store_true",
                   help="test-geometry SRM with random weights (smoke runs)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--zs_triplets", action="store_true",
                   help="score the GENERATED train set (cap.extend_zs / "
                        "cap.cc) exactly as the reference does — its "
                        "srm_utils imports zscir/data_utils.py, whose train "
                        "split unconditionally REPLACES the human triplets "
                        "(quirk SURVEY.md par.8.16/8.18). Default scores the "
                        "human triplets so the emitted image ids stay "
                        "coherent with get_cir_data's rank-window ids "
                        "(which come from the human-triplet id space, "
                        "data_utils_gen.py)")
    p.add_argument("--out", default="srm.npz")
    p.add_argument("--sims_out", default="sims.npz")
    p.add_argument("--k_negatives", type=int, default=1000)
    args = p.parse_args()
    data_path = args.data_path or ("fashionIQ_dataset" if args.dataset == "fiq"
                                   else "cirr_dataset")
    dress = args.dress_types.split(",") if args.dataset == "fiq" else None

    # fail fast, before the (slow) CLIP extraction
    have_srm = (args.unicom_ckpt and args.bge_ckpt) or args.tiny_srm
    if not have_srm and not args.allow_clip_srm:
        raise SystemExit(
            "SRM needs --unicom_ckpt + --bge_ckpt (ref srm_utils.py:35-69); "
            "pass --allow_clip_srm to substitute CLIP features instead")

    def make_ds(preprocess):
        return CIRDataset(args.dataset, "train", "relative", preprocess,
                          data_path, dress,
                          replace_extended=args.zs_triplets,
                          extend_suffix="zs")

    # -- CLIP role (cross-modal i2t/t2i, ref :102-106) --
    bb = build_backbone("clip", clip_model_name=args.clip_model_name)
    params = bb.init_params(jax.random.PRNGKey(0))
    if args.model_path:
        from spn4cir_tpu.models import convert
        params = convert.load_torch_checkpoint(args.model_path, bb, params)
    ds = make_ds(ImageTransform("targetpad", bb.input_dim))
    texts = [ds.caption_for(i, train=False) for i in range(len(ds.triplets))]
    clip_img = encode_images(
        ds, jax.jit(lambda im: bb.gallery_features(params, im)),
        ds.num_unique_images, bb.embed_dim, args.batch_size)

    def clip_text(chunk):
        tok = jnp.asarray(bb.tokenize(chunk))
        return l2_normalize(bb.encode_text(params, tok).astype(jnp.float32))

    clip_txt = encode_texts(texts, clip_text, bb.embed_dim)

    # -- SRM roles (intra-modal i2i/t2t: Unicom + BGE, ref :35-69) --
    if have_srm:
        from spn4cir_tpu.models.srm import SRMModel

        srm = SRMModel(tiny=args.tiny_srm,
                       bert_vocab_path=args.bert_vocab or None)
        srm_params = (srm.load_torch(args.unicom_ckpt, args.bge_ckpt)
                      if args.unicom_ckpt
                      else srm.init_params(jax.random.PRNGKey(0)))
        ds_srm = make_ds(ImageTransform("clip", srm.input_dim))
        srm_img = encode_images(
            ds_srm, jax.jit(lambda im: srm.encode_image(srm_params, im)),
            ds_srm.num_unique_images, srm.visual_dim, args.batch_size)
        srm_txt = encode_texts(
            texts, lambda chunk: srm.encode_text(srm_params, chunk),
            srm.text_dim)
    else:
        print("WARNING: substituting CLIP features for the SRM roles "
              "(Unicom/BGE checkpoints not provided)")
        srm_img, srm_txt = clip_img, clip_txt

    sims = compute_sims(clip_img, clip_txt, srm_img, srm_txt)
    np.savez_compressed(args.sims_out, **sims)
    refer = np.array([ds.imagename2id[t["reference_name"]] for t in ds.triplets])
    target = np.array([ds.imagename2id[t["target_name"]] for t in ds.triplets])
    save_srm(args.out, srm_scores(sims, refer, target, args.k_negatives))
    print(f"wrote {args.sims_out} and {args.out}")
