"""Synthetic FashionIQ / CIRR fixtures in the reference's on-disk JSON schema
(SURVEY.md §4 test plan: tiny-fixture integration tests on CPU)."""

import json
import os

import numpy as np
from PIL import Image


def _write_images(dirpath, names, size=40, seed=0):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.RandomState(seed)
    for name in names:
        arr = rng.randint(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(dirpath, f"{name}.png"))


def make_fiq(root, dress_types=("dress",), n_images=12, n_train=6, n_val=4,
             extended=True, extend_suffix="clip", seed=0):
    """Create a miniature FashionIQ tree under `root`."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "captions"), exist_ok=True)
    os.makedirs(os.path.join(root, "image_splits"), exist_ok=True)
    for dt in dress_types:
        names = [f"{dt}_img{i}" for i in range(n_images)]
        _write_images(os.path.join(root, "images"), names, seed=seed)

        def triplets(n, offset=0):
            out = []
            for i in range(n):
                a, b = rng.choice(n_images, 2, replace=False)
                out.append({
                    "candidate": names[a],
                    "target": names[b],
                    "captions": [f"cap {offset + i} a.", f"cap {offset + i} b?"],
                })
            return out

        with open(os.path.join(root, "captions", f"cap.{dt}.train.json"), "w") as f:
            json.dump(triplets(n_train), f)
        with open(os.path.join(root, "captions", f"cap.{dt}.val.json"), "w") as f:
            json.dump(triplets(n_val, 100), f)
        with open(os.path.join(root, "image_splits", f"split.{dt}.train.json"), "w") as f:
            json.dump(names, f)
        with open(os.path.join(root, "image_splits", f"split.{dt}.val.json"), "w") as f:
            json.dump(names, f)
        if extended:
            ext = []
            for i in range(n_train):
                a, b = rng.choice(n_images, 2, replace=False)
                ext.append({
                    "candidate": names[a],
                    "target": names[b],
                    "captions": [f"ext {i} v1", f"ext {i} v2"],
                    "llm_caption": f"llm rewrite {i}",
                })
            with open(os.path.join(
                    root, "captions", f"cap.extend_{extend_suffix}.train.json"), "w") as f:
                json.dump(ext, f)
            with open(os.path.join(
                    root, "captions", f"cap.extend_{extend_suffix}_llm.train.json"), "w") as f:
                json.dump(ext, f)
    return root


def make_cirr(root, n_images=14, n_train=6, n_val=5, group_size=4,
              extended=True, extend_suffix="clip", seed=0):
    """Create a miniature CIRR tree under `root` (dev split relpaths)."""
    rng = np.random.RandomState(seed)
    names = [f"cirr_img{i}" for i in range(n_images)]
    _write_images(os.path.join(root, "dev"), names, seed=seed)
    relpath = {n: f"dev/{n}.png" for n in names}
    os.makedirs(os.path.join(root, "cirr", "captions"), exist_ok=True)
    os.makedirs(os.path.join(root, "cirr", "image_splits"), exist_ok=True)

    def triplets(n, with_target=True, offset=0):
        out = []
        for i in range(n):
            picks = rng.choice(n_images, group_size, replace=False)
            ref, tgt = int(picks[0]), int(picks[1])
            row = {
                "pairid": offset + i,
                "reference": names[ref],
                "caption": f"make it like number {offset + i}",
                "img_set": {"members": [names[j] for j in picks]},
            }
            if with_target:
                row["target_hard"] = names[tgt]
            out.append(row)
        return out

    for split, rows in (("train", triplets(n_train)),
                        ("val", triplets(n_val, offset=50)),
                        ("test1", triplets(n_val, with_target=False, offset=90))):
        with open(os.path.join(root, "cirr", "captions", f"cap.rc2.{split}.json"), "w") as f:
            json.dump(rows, f)
        with open(os.path.join(root, "cirr", "image_splits", f"split.rc2.{split}.json"), "w") as f:
            json.dump(relpath, f)
    if extended:
        ext = []
        for i in range(n_train):
            picks = rng.choice(n_images, 2, replace=False)
            ext.append({
                "pairid": 0,
                "reference": names[int(picks[0])],
                "target_hard": names[int(picks[1])],
                "caption": [f"ext cirr {i} v1", f"ext cirr {i} v2"],
                "llm_caption": f"llm cirr rewrite {i}",
                "img_set": {"members": ["xxx"]},  # quirk SURVEY.md §8.13
            })
        with open(os.path.join(
                root, "cirr", "captions", f"cap.rc2.train.extend_{extend_suffix}.json"), "w") as f:
            json.dump(ext, f)
    return root
