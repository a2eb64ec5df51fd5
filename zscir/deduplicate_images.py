"""Thin CLI wrapper over the shared datagen core. Reference counterpart: zscir/deduplicate_images.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.datagen.dedup import deduplicate

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=["fiq", "cirr"])
    p.add_argument("--data_path", default="")
    p.add_argument("--dress_types", default="dress,shirt,toptee")
    args = p.parse_args()
    data_path = args.data_path or ("fashionIQ_dataset" if args.dataset == "fiq"
                                   else "cirr_dataset")
    ds = CIRDataset(args.dataset, "train", "relative",
                    ImageTransform("targetpad", 224), data_path,
                    args.dress_types.split(",") if args.dataset == "fiq" else None)
    out = deduplicate(ds, data_path)
    print(f"wrote {out} ({ds.num_unique_images} images scanned)")
