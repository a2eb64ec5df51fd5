"""SRM (similarity-rank matcher): pair-quality scores + hard-negative pools.

Parity target: `zscir/srm_utils.py` — the reference encodes all train images
with Unicom ViT-L/14 + all captions with BGE (`:35-69`) and CLIP ViT-L/14
(`:72-116`), computes 4 similarity matrices (`:119-131`), then per-triplet
rank scores and top-1000 hard negatives in a Python loop (`:142-183`).

Here the encoders are pluggable (any feature arrays; our CLIP backbone is
the default image/text encoder — the Unicom/BGE weights are external data
assets) and the per-triplet loop is vectorized: ranks come from one
`sum(greater)` reduction per matrix, negatives from one top-k.

Outputs (npz `srm.npz`, same tensor roles as the reference's srm.pth):
  r_fn / m_fn / t_fn : (N, K) hard-negative indices (refer/text/target)
  rt / rm / mt       : (N,) symmetric rank-sum quality scores
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def compute_sims(clip_image_feats, clip_text_feats, srm_image_feats,
                 srm_text_feats) -> Dict[str, np.ndarray]:
    """The four matrices of srm_utils.calcu_sims (`:119-131`): cross-modal
    (CLIP) and intra-modal (SRM model)."""
    i2t = clip_image_feats @ clip_text_feats.T
    return {
        "i2t": i2t,
        "t2i": i2t.T,
        "i2i": srm_image_feats @ srm_image_feats.T,
        "t2t": srm_text_feats @ srm_text_feats.T,
    }


def _rank_of(sims: np.ndarray, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """rank of sims[rows[i], cols[i]] within row rows[i], descending."""
    picked = sims[rows]
    tgt = picked[np.arange(len(rows)), cols]
    return (picked > tgt[:, None]).sum(axis=1)


def srm_scores(
    sims: Dict[str, np.ndarray],
    refer_ids: np.ndarray,
    target_ids: np.ndarray,
    k_negatives: int = 1000,
) -> Dict[str, np.ndarray]:
    """Per-triplet symmetric rank scores + top-K intra-modal hard negatives
    (vectorized form of srm_utils.get_srm_out `:142-183`). Triplet i's text
    row is row i of the cross matrices."""
    n = len(refer_ids)
    tri = np.arange(n)

    rt = (_rank_of(sims["i2i"], refer_ids, target_ids)
          + _rank_of(sims["i2i"], target_ids, refer_ids))
    rm = (_rank_of(sims["t2i"], tri, refer_ids)
          + _rank_of(sims["i2t"], refer_ids, tri))
    mt = (_rank_of(sims["t2i"], tri, target_ids)
          + _rank_of(sims["i2t"], target_ids, tri))

    # hard negatives: top-K most-similar others (self excluded, ref fills
    # the diagonal with -10000 before ranking)
    def topk_excl_self(mat, rows):
        sub = mat[rows].copy()
        sub[np.arange(len(rows)), rows] = -1e4
        k = min(k_negatives, sub.shape[1])
        idx = np.argpartition(-sub, kth=k - 1, axis=1)[:, :k]
        order = np.take_along_axis(sub, idx, axis=1).argsort(axis=1)[:, ::-1]
        return np.take_along_axis(idx, order, axis=1)

    def topk_excl_self_text(mat):
        sub = mat.copy()
        np.fill_diagonal(sub, -1e4)
        k = min(k_negatives, sub.shape[1])
        idx = np.argpartition(-sub, kth=k - 1, axis=1)[:, :k]
        order = np.take_along_axis(sub, idx, axis=1).argsort(axis=1)[:, ::-1]
        return np.take_along_axis(idx, order, axis=1)

    return {
        "rt": rt, "rm": rm, "mt": mt,
        "t_fn": topk_excl_self(sims["i2i"], target_ids),
        "r_fn": topk_excl_self(sims["i2i"], refer_ids),
        "m_fn": topk_excl_self_text(sims["t2t"])[tri],
    }


def save_srm(path: str, scores: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **scores)


def load_srm(path: str) -> Dict[str, np.ndarray]:
    return dict(np.load(path))


def extract_all_features(encode_fn, batches) -> np.ndarray:
    """Run a jitted encoder over padded (ids, batch) pairs, L2-normalized."""
    bufs = None
    for ids, batch in batches:
        out = jax.device_get(encode_fn(jnp.asarray(batch)))
        out = out / np.linalg.norm(out, axis=-1, keepdims=True)
        if bufs is None:
            bufs = {}
            bufs["data"] = np.zeros((int(max(ids)) + 1, out.shape[-1]), out.dtype)
        grow = int(max(ids)) + 1
        if grow > bufs["data"].shape[0]:
            # np.resize would FILL new rows with repeated copies of existing
            # data; never-written rows must be zeros, not phantom duplicates
            bigger = np.zeros((grow, out.shape[-1]), bufs["data"].dtype)
            bigger[: bufs["data"].shape[0]] = bufs["data"]
            bufs["data"] = bigger
        valid = ids >= 0
        bufs["data"][ids[valid]] = out[valid]
    return bufs["data"]
