"""Contrastive (InfoNCE) losses for CIR, as pure-XLA functional ops.

These are the behavioral equivalents of the reference's loss family
(SURVEY.md §2.1/§2.2):
  - `infonce_loss` (`clip4cir/models.py:163-167`)        -> `in_batch_infonce`
  - `bank_large_step` full-bank CE (`models.py:130-144`) -> `bank_infonce`
  - `part_infonce_loss` (`models.py:109-128`)            -> `sampled_neg_infonce`
  - blip2 max-over-query CE
    (`blip2_qformer_cir_align_prompt.py:256-265`)        -> `max_query_infonce`
  - negtype ablation losses (`clip4cir/models_negtype.py:53-128`)
                                                          -> `negtype_losses`

The reference computes several of these with per-sample Python loops; here
each is one einsum the MXU can tile. A blocked Pallas implementation of the
full-bank loss (for very large banks) lives in
`spn4cir_tpu.ops.bank_kernels`; this module is the semantic ground truth the
kernel is tested against.

All losses take logits in float32 regardless of input dtype (bf16-safe).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over integer labels; logits upcast to f32 for a stable logsumexp."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    pos = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return jnp.mean(lse - pos)


def in_batch_infonce(query: jnp.ndarray, target: jnp.ndarray, tau: jnp.ndarray | float) -> jnp.ndarray:
    """In-batch InfoNCE: positives on the diagonal (stage-1 loss)."""
    logits = jnp.dot(query, target.T, preferred_element_type=jnp.float32) / tau
    return cross_entropy(logits, jnp.arange(query.shape[0]))


def bank_infonce(
    query: jnp.ndarray,
    target_bank: jnp.ndarray,
    labels: jnp.ndarray,
    tau: jnp.ndarray | float,
) -> jnp.ndarray:
    """Full-bank InfoNCE: every bank row is a negative except `labels[i]`.

    query: (B, D) normalized; target_bank: (M, D) normalized; labels: (B,)
    int image-ids into the bank. This is the "scaling negatives" stage-2 loss.
    """
    logits = jnp.dot(query, target_bank.T, preferred_element_type=jnp.float32) / tau
    return cross_entropy(logits, labels)


def sampled_neg_infonce(
    query: jnp.ndarray,
    target_bank: jnp.ndarray,
    labels: jnp.ndarray,
    neg_idx: jnp.ndarray,
    tau: jnp.ndarray | float,
) -> jnp.ndarray:
    """InfoNCE over `neg_num` pre-sampled bank negatives + the positive.

    neg_idx: (B, neg_num) int indices into the bank, sampled on host
    WITHOUT replacement and excluding the positive (the reference's
    `random.sample` distribution, clip4cir/models.py:109-113 — see
    train.stage2.sample_negatives). Positive sits in column 0.
    """
    pos = jnp.take(target_bank, labels, axis=0)  # (B, D)
    negs = jnp.take(target_bank, neg_idx.reshape(-1), axis=0).reshape(
        (*neg_idx.shape, target_bank.shape[-1])
    )  # (B, N, D)
    cands = jnp.concatenate([pos[:, None, :], negs], axis=1)  # (B, 1+N, D)
    logits = jnp.einsum(
        "bd,bnd->bn", query, cands, preferred_element_type=jnp.float32
    ) / tau
    return cross_entropy(logits, jnp.zeros((query.shape[0],), jnp.int32))


def max_query_infonce(
    fusion_feats: jnp.ndarray,
    target_bank: jnp.ndarray,
    labels: jnp.ndarray,
    tau: jnp.ndarray | float,
) -> jnp.ndarray:
    """BLIP-2 stage-2 loss: per-target max over the 32 query tokens.

    fusion_feats: (B, D); target_bank: (M, Q, D); labels: (B,).
    The reference computes this with a per-sample Python loop
    (`blip2_qformer_cir_align_prompt.py:256-265`); here it is one einsum.
    """
    sims = jnp.einsum(
        "bd,mqd->bmq", fusion_feats, target_bank, preferred_element_type=jnp.float32
    )
    logits = jnp.max(sims, axis=-1) / tau  # (B, M)
    return cross_entropy(logits, labels)


def max_query_scores(
    fusion_feats: jnp.ndarray, target_bank: jnp.ndarray
) -> jnp.ndarray:
    """Inference-time similarity scores for the BLIP-2 backbone: (B, M)."""
    sims = jnp.einsum(
        "bd,mqd->bmq", fusion_feats, target_bank, preferred_element_type=jnp.float32
    )
    return jnp.max(sims, axis=-1)


def negtype_losses(
    refer: jnp.ndarray,
    text: jnp.ndarray,
    target: jnp.ndarray,
    tau: jnp.ndarray | float,
) -> Dict[str, jnp.ndarray]:
    """The four negative flavors of the negtype ablation
    (`clip4cir/models_negtype.py:53-128`), each as a batched einsum instead of
    the reference's per-sample loops.

    refer/text: (B, D) *raw* (unnormalized) features; target: (B, D)
    normalized — matching the reference's forward, which normalizes the
    combined query inside each loss.

    - 'target': in-batch InfoNCE, normalize(refer_i + text_i) vs targets.
    - 'query' : reversed direction, target_i vs all queries.
    - 'refer' : logits[i, j] = <normalize(refer_j + text_i), target_i>, pos j==i.
    - 'text'  : logits[i, j] = <normalize(refer_i + text_j), target_i>, pos j==i.
    """
    out: Dict[str, jnp.ndarray] = {}
    b = refer.shape[0]
    labels = jnp.arange(b)
    query = l2_normalize(refer + text)
    out["target"] = in_batch_infonce(query, target, tau)
    out["query"] = in_batch_infonce(target, query, tau)

    # (B, B, D) cross combinations: [i, j] = refer_i + text_j
    cross = l2_normalize(refer[:, None, :] + text[None, :, :])
    # text negatives: vary the text (column j), score against target_i
    txt_logits = jnp.einsum(
        "ijd,id->ij", cross, target, preferred_element_type=jnp.float32
    ) / tau
    out["text"] = cross_entropy(txt_logits, labels)
    # refer negatives: vary the reference (cross[j, i] = refer_j + text_i)
    ref_logits = jnp.einsum(
        "jid,id->ij", cross, target, preferred_element_type=jnp.float32
    ) / tau
    out["refer"] = cross_entropy(ref_logits, labels)
    return out


def combine_negtype(losses: Dict[str, jnp.ndarray], neg_type: int) -> jnp.ndarray:
    """Average the subset of losses selected by the 4-bit mask `neg_type`
    (bit0=refer, bit1=text, bit2=target, bit3=query;
    ref models_negtype.py:110-126)."""
    order = ("refer", "text", "target", "query")
    picks = [losses[name] for i, name in enumerate(order) if neg_type & (1 << i)]
    if not picks:
        raise ValueError("neg_type selects no losses")
    return sum(picks) / len(picks)
