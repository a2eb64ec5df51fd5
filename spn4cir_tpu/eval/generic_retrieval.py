"""Generic image/text retrieval CLI helpers.

Parity target: `zscir/retrieval.py` — encode a directory/JSON/list of images
with CLIP, run i2i (or t2i) top-k retrieval, export result folders."""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.models.api import CIRBackbone


def list_images(source: str) -> List[str]:
    """Accepts a directory, a JSON list file, or a comma-separated list
    (ref zscir/retrieval.py:30-76 ImageDataset inputs)."""
    if os.path.isdir(source):
        exts = (".png", ".jpg", ".jpeg", ".webp")
        return sorted(
            os.path.join(source, f) for f in os.listdir(source)
            if f.lower().endswith(exts))
    if source.endswith(".json"):
        with open(source) as f:
            return json.load(f)
    return [s for s in source.split(",") if s]


def encode_paths(backbone: CIRBackbone, params, paths: Sequence[str],
                 transform: Optional[ImageTransform] = None,
                 batch_size: int = 32) -> np.ndarray:
    from spn4cir_tpu.eval.retrieval import _backbone_jit

    tf = transform or ImageTransform("clip", backbone.input_dim)
    jitted = _backbone_jit(
        backbone, "gallery_features",
        lambda: jax.jit(lambda p, imgs: backbone.gallery_features(p, imgs)))
    encode = lambda imgs: jitted(params, imgs)  # noqa: E731
    feats = []
    for start in range(0, len(paths), batch_size):
        chunk = paths[start : start + batch_size]
        batch = np.stack([tf(Image.open(p)) for p in chunk])
        pad = batch_size - len(chunk)
        if pad:
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
        out = jax.device_get(encode(jnp.asarray(batch)))
        feats.append(out[: len(chunk)])
    return np.concatenate(feats)


def i2i_topk(query_feats: np.ndarray, gallery_feats: np.ndarray, k: int = 10,
             exclude_self: Optional[bool] = None) -> np.ndarray:
    """exclude_self=None (default) auto-detects self-retrieval by array
    identity; a square score matrix alone is NOT evidence of it (a disjoint
    gallery that merely matches the query count must keep its diagonal)."""
    if exclude_self is None:
        exclude_self = query_feats is gallery_feats
    scores = query_feats @ gallery_feats.T
    if exclude_self:
        if scores.shape[0] != scores.shape[1]:
            raise ValueError(
                "exclude_self=True requires the query set to BE the gallery")
        np.fill_diagonal(scores, -np.inf)
    k = min(k, scores.shape[1])
    idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
    order = np.take_along_axis(scores, idx, axis=1).argsort(axis=1)[:, ::-1]
    return np.take_along_axis(idx, order, axis=1)


def t2i_topk(backbone: CIRBackbone, params, texts: Sequence[str],
             gallery_feats: np.ndarray, k: int = 10) -> np.ndarray:
    from spn4cir_tpu.ops.infonce import l2_normalize

    ids = jnp.asarray(backbone.tokenize(list(texts)))
    feats = jax.device_get(l2_normalize(
        backbone.encode_text(params, ids).astype(jnp.float32)))
    return i2i_topk(feats, gallery_feats, k, exclude_self=False)


def export_results(query_paths: Sequence[str], gallery_paths: Sequence[str],
                   topk_idx: np.ndarray, out_dir: str) -> None:
    """Result-folder export (ref zscir/retrieval.py:90-114): one folder per
    query containing the query image + ranked retrievals."""
    os.makedirs(out_dir, exist_ok=True)
    for qi, row in enumerate(topk_idx):
        folder = os.path.join(out_dir, f"query_{qi:04d}")
        os.makedirs(folder, exist_ok=True)
        if qi < len(query_paths) and os.path.exists(query_paths[qi]):
            shutil.copy(query_paths[qi], os.path.join(
                folder, "query" + os.path.splitext(query_paths[qi])[1]))
        for rank, gi in enumerate(row):
            src = gallery_paths[int(gi)]
            if os.path.exists(src):
                shutil.copy(src, os.path.join(
                    folder, f"rank{rank:02d}" + os.path.splitext(src)[1]))
