"""Thin CLI wrapper over the shared datagen core. Reference counterpart: zscir/captioner_llava.py + captioner_blip.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

from PIL import Image

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.datagen.captioner import caption_images, stub_captioner, write_it_list

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=["fiq", "cirr"])
    p.add_argument("--data_path", default="")
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    p.add_argument("--mllm", default="stub",
                   help="captioner tag; 'stub' = model-free fallback. Plug a "
                        "real MLLM by importing datagen.captioner directly.")
    p.add_argument("--word_num", type=int, default=10)
    p.add_argument("--category", default="image")
    args = p.parse_args()
    data_path = args.data_path or ("fashionIQ_dataset" if args.dataset == "fiq"
                                   else "cirr_dataset")
    ds = CIRDataset(args.dataset, "train", "relative",
                    ImageTransform("targetpad", 224), data_path,
                    args.dress_types.split(",") if args.dataset == "fiq" else None)

    def images():
        import numpy as np
        for name, path in zip(ds.imagenames, ds.imagepaths):
            yield name, np.asarray(Image.open(path).convert("RGB"))

    it_list = caption_images(images(), stub_captioner,
                             category=args.category, num_words=args.word_num)
    out = write_it_list(it_list, args.dataset, args.mllm, args.word_num)
    print(f"wrote {len(it_list)} captions -> {out}")
