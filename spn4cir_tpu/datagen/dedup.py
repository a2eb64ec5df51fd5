"""Image de-duplication -> `optimized_images.json` dedup map.

Parity target: `zscir/deduplicate_images.py` — the reference does an O(N^2)
exact pixel-equality scan (`:13-49`); identical output here via content
hashing in O(N) (SURVEY.md §7 build step 8). Output schemas match:
  same_image_list.json : list of duplicate groups (lists of image names)
  optimized_images.json: [names, paths, name2id] — canonical image list plus
      a map sending every name (duplicates included) to its canonical id —
      consumed by every CIRDataset (`clip4cir/data_utils.py:243-247`).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image


def image_digest(path: str) -> str:
    """Hash of decoded RGB pixels (not file bytes): matches the reference's
    pixel-equality notion across re-encoded files."""
    with Image.open(path) as img:
        arr = np.asarray(img.convert("RGB"))
    h = hashlib.sha256()
    h.update(str(arr.shape).encode())
    h.update(arr.tobytes())
    return h.hexdigest()


def find_duplicate_groups(names: Sequence[str], paths: Sequence[str]
                          ) -> List[List[str]]:
    by_digest: Dict[str, List[str]] = {}
    for name, path in zip(names, paths):
        by_digest.setdefault(image_digest(path), []).append(name)
    return [group for group in by_digest.values() if len(group) > 1]


def build_optimized_images(
    names: Sequence[str],
    paths: Sequence[str],
    groups: List[List[str]],
) -> Tuple[List[str], List[str], Dict[str, int]]:
    """Canonicalize: keep the first member of each duplicate group, remap all
    members to the canonical id (ref deduplicate_images.py check():51-73)."""
    canonical_of: Dict[str, str] = {}
    for group in groups:
        head = group[0]
        for member in group[1:]:
            canonical_of[member] = head
    out_names: List[str] = []
    out_paths: List[str] = []
    name2id: Dict[str, int] = {}
    for name, path in zip(names, paths):
        if name in canonical_of:
            continue
        name2id[name] = len(out_names)
        out_names.append(name)
        out_paths.append(path)
    for dup, head in canonical_of.items():
        name2id[dup] = name2id[head]
    return out_names, out_paths, name2id


def deduplicate(dataset, output_dir: str) -> str:
    """Run dedup over a train CIRDataset's unique images; writes both JSONs
    into `output_dir` and returns the optimized_images.json path."""
    groups = find_duplicate_groups(dataset.imagenames, dataset.imagepaths)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "same_image_list.json"), "w") as f:
        json.dump(groups, f)
    names, paths, name2id = build_optimized_images(
        dataset.imagenames, dataset.imagepaths, groups)
    out = os.path.join(output_dir, "optimized_images.json")
    with open(out, "w") as f:
        json.dump([names, paths, name2id], f)
    return out
