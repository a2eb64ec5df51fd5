"""Retrieval metrics (FashionIQ / CIRR Recall@K, CIRR subset Recall@K).

Parity target: `clip4cir/validate.py:19-51` (FIQ) and `:111-156` (CIRR).

The reference ranks with a full argsort over gallery names (numpy string
arrays) and removes the reference image post-hoc. Here everything is integer
ids and rank counting on device:

    rank(target) = #{ j : score[j] > score[target], j != reference }

which equals the reference's argsort position exactly whenever scores are
tie-free (ties are broken in the target's favor here; torch.argsort breaks
them arbitrarily). Recall@K = mean(rank < K). This is O(Q*N) elementwise work
with no sort, no string compares, and no host round-trip.
"""

from __future__ import annotations

from typing import Optional, Dict, Sequence

import jax
import jax.numpy as jnp



def target_ranks(
    scores: jnp.ndarray,
    target_ids: jnp.ndarray,
    refer_ids: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Per-query rank of the target in the gallery, reference excluded when
    `refer_ids` is given.

    scores: (Q, N) similarity (higher = better); target_ids/refer_ids: (Q,).
    refer_ids=None skips the exclusion — the published FIQ eval only
    filters the reference for clip4cir/zscir (validate.py:40); tgcir, blip
    and blip2 rank the full gallery (tgcir/validate.py:48-58,
    blip4cir/validate.py:40-52, blip24cir/validate.py:29-43).
    """
    q = scores.shape[0]
    rows = jnp.arange(q)
    tgt = scores[rows, target_ids]  # (Q,)
    greater = scores > tgt[:, None]
    if refer_ids is not None:
        # exclude the reference column (ref validate.py:131-134 / :40)
        refer_onehot = jax.nn.one_hot(refer_ids, scores.shape[1],
                                      dtype=jnp.bool_)
        greater = jnp.logical_and(greater, jnp.logical_not(refer_onehot))
    return jnp.sum(greater, axis=1)


def subset_ranks(
    scores: jnp.ndarray,
    target_ids: jnp.ndarray,
    refer_ids: jnp.ndarray,
    member_ids: jnp.ndarray,
) -> jnp.ndarray:
    """Rank of the target among its CIRR subset members (ref excluded).

    member_ids: (Q, G) gallery ids of the img_set members (may include the
    reference and the target; ref validate.py:139-142).
    """
    rows = jnp.arange(scores.shape[0])
    tgt = scores[rows, target_ids]
    member_scores = jnp.take_along_axis(scores, member_ids, axis=1)  # (Q, G)
    valid = jnp.logical_and(
        member_ids != refer_ids[:, None],
        member_ids != target_ids[:, None],
    )
    greater = jnp.logical_and(member_scores > tgt[:, None], valid)
    return jnp.sum(greater, axis=1)


def recall_at(ranks: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.mean((ranks < k).astype(jnp.float32)) * 100.0


def fiq_metrics(
    scores: jnp.ndarray,
    target_ids: jnp.ndarray,
    refer_ids: Optional[jnp.ndarray],
    ks: Sequence[int] = (10, 50),
) -> Dict[str, float]:
    """FashionIQ Recall@10/50 per dress type (ref validate.py:19-51)."""
    ranks = target_ranks(scores, target_ids, refer_ids)
    return {f"recall_at{k}": float(recall_at(ranks, k)) for k in ks}


def cirr_metrics(
    scores: jnp.ndarray,
    target_ids: jnp.ndarray,
    refer_ids: jnp.ndarray,
    member_ids: jnp.ndarray,
    ks: Sequence[int] = (1, 5, 10, 50),
    group_ks: Sequence[int] = (1, 2, 3),
) -> Dict[str, float]:
    """CIRR global + subset recalls (ref validate.py:111-156). Returns a dict
    with recall_at{k}, group_recall_at{k}, and the composite
    arithmetic_mean = (R@5 + Rsub@1)/2 tracked by training
    (ref clip4cir/train.py:150)."""
    ranks = target_ranks(scores, target_ids, refer_ids)
    granks = subset_ranks(scores, target_ids, refer_ids, member_ids)
    out = {f"recall_at{k}": float(recall_at(ranks, k)) for k in ks}
    out.update({f"group_recall_at{k}": float(recall_at(granks, k)) for k in group_ks})
    out["arithmetic_mean"] = (out["recall_at5"] + out["group_recall_at1"]) / 2
    return out


def fiq_average(per_type: Sequence[Dict[str, float]]) -> Dict[str, float]:
    """Average across dress types + Rmean = (avg R@10 + avg R@50)/2
    (ref clip4cir/train.py:177-183)."""
    avg10 = sum(m["recall_at10"] for m in per_type) / len(per_type)
    avg50 = sum(m["recall_at50"] for m in per_type) / len(per_type)
    return {
        "avg_recall_at10": avg10,
        "avg_recall_at50": avg50,
        "mean_recall": (avg10 + avg50) / 2,
    }


def topk_names(
    scores: jnp.ndarray,
    refer_ids: jnp.ndarray,
    k: int,
) -> jnp.ndarray:
    """Top-k gallery ids per query with the reference excluded; used by the
    CIRR test-submission path (ref cirr_test_submission.py:89-109)."""
    cols = jnp.arange(scores.shape[1])
    masked = jnp.where(cols[None, :] == refer_ids[:, None], -jnp.inf, scores)
    _, idx = jax.lax.top_k(masked, min(k, scores.shape[1]))
    return idx


def subset_topk_names(
    scores: jnp.ndarray,
    refer_ids: jnp.ndarray,
    member_ids: jnp.ndarray,
    k: int,
) -> jnp.ndarray:
    """Top-k among subset members (reference excluded), returned as gallery
    ids. member_ids: (Q, G)."""
    member_scores = jnp.take_along_axis(scores, member_ids, axis=1)
    member_scores = jnp.where(member_ids == refer_ids[:, None], -jnp.inf,
                              member_scores)
    _, local_idx = jax.lax.top_k(member_scores, k)
    return jnp.take_along_axis(member_ids, local_idx, axis=1)
