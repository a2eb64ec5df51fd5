"""Case-study tooling: per-query rank dumps and model-vs-model comparisons.

Parity targets: `clip4cir/validate_case.py` (dumps each validation query's
target rank + top-10 retrieved names to `cases/*.json`) and
`clip4cir/analysis_case.py` (collects queries where model A fails and model
B ranks the target first, copying the associated images for inspection).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.eval import metrics as M
from spn4cir_tpu.eval.retrieval import (
    GalleryIndex,
    generate_val_predictions,
    query_scores,
)


def dump_cases(
    backbone,
    params,
    dataset,
    index: GalleryIndex,
    out_path: str,
    top_k: int = 10,
    batch_size: int = 32,
) -> List[dict]:
    """One record per query: caption, reference/target names, target rank,
    top-k retrieved names (ref validate_case.py:53-60)."""
    preds = generate_val_predictions(backbone, params, dataset, index, batch_size)
    scores = query_scores(backbone, preds, index)
    refer = jnp.asarray(preds["refer_gid"])
    target = jnp.asarray(preds["target_gid"])
    ranks = np.asarray(M.target_ranks(scores, target, refer))
    topk = np.asarray(M.topk_names(scores, refer, top_k))
    names = np.asarray(index.names)

    captions = []
    for i in range(len(dataset.triplets)):
        captions.append(dataset.caption_for(i, train=False))

    records = []
    for i in range(len(ranks)):
        records.append({
            "caption": captions[i],
            "reference_name": names[preds["refer_gid"][i]],
            "target_name": names[preds["target_gid"][i]],
            "rank": int(ranks[i]),
            "topk": names[topk[i]].tolist(),
        })
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(records, f, indent=1)
    return records


def compare_cases(
    cases_a: List[dict],
    cases_b: List[dict],
    fail_rank: int = 10,
    win_rank: int = 0,
) -> List[dict]:
    """Queries where model A misses (rank >= fail_rank) and model B nails it
    (rank <= win_rank) — ref analysis_case.py:30-47."""
    out = []
    for a, b in zip(cases_a, cases_b):
        if a["rank"] >= fail_rank and b["rank"] <= win_rank:
            out.append({"query": a, "better": b})
    return out


def export_case_images(
    cases: List[dict],
    name_to_path: Dict[str, str],
    out_dir: str,
    limit: Optional[int] = None,
) -> int:
    """Copy reference/target images of selected cases for eyeballing
    (ref analysis_case.py image copying)."""
    os.makedirs(out_dir, exist_ok=True)
    copied = 0
    for i, case in enumerate(cases[:limit] if limit else cases):
        q = case["query"] if "query" in case else case
        folder = os.path.join(out_dir, f"case_{i:04d}")
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, "caption.txt"), "w") as f:
            f.write(q["caption"])
        for role in ("reference_name", "target_name"):
            src = name_to_path.get(q[role])
            if src and os.path.exists(src):
                shutil.copy(src, os.path.join(folder, f"{role}{os.path.splitext(src)[1]}"))
                copied += 1
    return copied
