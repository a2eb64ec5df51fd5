"""Gallery indexing + query prediction + validation drivers.

Parity targets: `extract_index_features` (`clip4cir/utils.py:24-50`),
`generate_{fiq,cirr}_val_predictions` / `compute_*_val_metrics`
(`clip4cir/validate.py`), `fiq_val_retrieval` / `cirr_val_retrieval`
(`clip4cir/validate.py:54-66,216-231`).

TPU-native: gallery encode is one jitted scan over fixed-size batches; query
reference features are gathered from the already-encoded gallery by integer
id (quirk SURVEY.md §8.8 — eval reuses gallery features for references,
never a fresh encode); scoring/ranking runs on device via
`spn4cir_tpu.eval.metrics` (no argsort, no string masks).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.data.datasets import CIRDataset, iter_gallery, iter_relative_eval
from spn4cir_tpu.eval import metrics as M
from spn4cir_tpu.models.api import CIRBackbone


def extract_index_features(
    backbone: CIRBackbone,
    params,
    dataset: CIRDataset,
    batch_size: int = 32,
    num_workers: int = 4,
) -> Tuple[jnp.ndarray, List[str]]:
    """Encode the 'classic'-mode gallery -> (features (N, D) normalized,
    names). Padded tail rows are dropped by id mask."""
    encode = jax.jit(lambda imgs: backbone.gallery_features(params, imgs))
    names = dataset.gallery_names
    feats = np.zeros((len(names), 0), np.float32)
    buf = None
    for ids, images in iter_gallery(dataset, batch_size, num_workers):
        out = jax.device_get(encode(jnp.asarray(images)))
        if buf is None:
            buf = np.zeros((len(names), *out.shape[1:]), out.dtype)
        valid = ids >= 0
        buf[ids[valid]] = out[valid]
    if buf is None:
        raise ValueError("empty gallery")
    return jnp.asarray(buf), list(names)


def generate_val_predictions(
    backbone: CIRBackbone,
    params,
    dataset: CIRDataset,
    index_features: jnp.ndarray,
    batch_size: int = 32,
) -> Dict[str, np.ndarray]:
    """Queries -> fused features + id arrays. Reference features are gallery
    rows (quirk §8.8). Returns dict with query_feats, refer_gid, target_gid
    (+ member_gids, pairid for CIRR)."""
    fuse = jax.jit(
        lambda refer, text_ids: backbone.fuse(params, refer, text_ids))
    chunks, refer, target, members, pairids = [], [], [], [], []
    for batch in iter_relative_eval(dataset, batch_size):
        text_ids = jnp.asarray(backbone.tokenize(batch["captions"]))
        ref_feats = jnp.take(index_features, jnp.asarray(batch["refer_gid"]), axis=0)
        chunks.append(jax.device_get(fuse(ref_feats, text_ids)))
        refer.append(batch["refer_gid"])
        target.append(batch["target_gid"])
        if "member_gids" in batch:
            members.append(batch["member_gids"])
            pairids.append(batch["pairid"])
    out = {
        "query_feats": np.concatenate(chunks),
        "refer_gid": np.concatenate(refer),
        "target_gid": np.concatenate(target),
    }
    if members:
        out["member_gids"] = np.concatenate(members)
        out["pairid"] = np.concatenate(pairids)
    return out


def _pooled_gallery(backbone: CIRBackbone, index_features: jnp.ndarray) -> jnp.ndarray:
    """Gallery features used for scoring. Token-shaped galleries (tgcir/blip2
    token banks) are mean-pooled + renormalized (ref validate.py:121-123)."""
    from spn4cir_tpu.ops.infonce import l2_normalize

    g = index_features
    if g.ndim > 2:
        g = jnp.mean(g, axis=1)
    return l2_normalize(g.astype(jnp.float32))


def fiq_val_retrieval(
    backbone: CIRBackbone,
    params,
    data_path: str,
    dress_type: str,
    preprocess,
    batch_size: int = 32,
    index: Optional[Tuple[jnp.ndarray, List[str]]] = None,
) -> Dict[str, float]:
    classic = CIRDataset("fiq", "val", "classic", preprocess, data_path, [dress_type])
    relative = CIRDataset("fiq", "val", "relative", preprocess, data_path, [dress_type])
    feats, _names = index if index is not None else extract_index_features(
        backbone, params, classic, batch_size)
    preds = generate_val_predictions(backbone, params, relative, feats, batch_size)
    scores = backbone.score_queries(
        jnp.asarray(preds["query_feats"]), _pooled_gallery(backbone, feats))
    return M.fiq_metrics(scores, jnp.asarray(preds["target_gid"]),
                         jnp.asarray(preds["refer_gid"]))


def cirr_val_retrieval(
    backbone: CIRBackbone,
    params,
    data_path: str,
    preprocess,
    batch_size: int = 32,
    index: Optional[Tuple[jnp.ndarray, List[str]]] = None,
) -> Dict[str, float]:
    classic = CIRDataset("cirr", "val", "classic", preprocess, data_path)
    relative = CIRDataset("cirr", "val", "relative", preprocess, data_path)
    feats, _names = index if index is not None else extract_index_features(
        backbone, params, classic, batch_size)
    preds = generate_val_predictions(backbone, params, relative, feats, batch_size)
    scores = backbone.score_queries(
        jnp.asarray(preds["query_feats"]), _pooled_gallery(backbone, feats))
    return M.cirr_metrics(scores, jnp.asarray(preds["target_gid"]),
                          jnp.asarray(preds["refer_gid"]),
                          jnp.asarray(preds["member_gids"]))
