"""Multi-chip serving: gallery sharded over a device mesh.

The single-chip `RetrievalService` holds the whole score-ready gallery in
one chip's HBM, which caps gallery size (a 10M-image gallery at D=512 bf16
is ~10 GB — most of a v5e chip). This module shards the gallery row-wise
over the mesh's 'bank' axis (the same axis `parallel/loss.py` uses for the
training-time negatives) and answers queries with an exact two-stage
distributed top-k:

  1. inside `jax.shard_map`, every device scores the queries against its
     local gallery shard and takes a LOCAL top-kk with row ids globalized
     via the shard offset — only (B, kk) candidates per device leave the
     shard (never the (B, M) score matrix);
  2. the per-shard candidate sets concatenate over the bank axis
     (kk·n_shards rows ride the ICI) and a final top-k merges them.

Exactness: every true global top-kk row ranks ≤ kk inside its own shard,
so it survives stage 1; the merge's tie-break (lowest candidate position =
lowest shard, then lowest local index) equals single-chip `lax.top_k`'s
lowest-global-index rule. Results are identical to `RetrievalService` on
the same gallery.

The reference has no CIR serving path at all (SURVEY.md §5 — it vendors
LLaVA's REST stack for MLLM serving only); this is the TPU-native
scale-out of `serve/service.py`. Works for flat (M, D) galleries and for
blip2's (M, 32, 256) max-over-query galleries alike — `score_queries` is
row-wise, so row sharding composes with any backbone.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from spn4cir_tpu.parallel.mesh import AXIS_BANK, put_bank
from spn4cir_tpu.serve.service import BatchingRetrievalService, RetrievalService


@dataclasses.dataclass
class ShardedGalleryIndex:
    """Gallery index with `target` padded to the shard count and laid out
    row-sharded over the mesh's 'bank' axis. `host_target` keeps the
    unpadded features host-side so mutations (add_images / refresh) can
    rebuild the sharded layout without a device round-trip."""

    target: jnp.ndarray        # (Mp, ...) device, rows sharded over 'bank'
    refer: np.ndarray          # (M, ...) host, fusion lookup
    names: List[str]
    host_target: np.ndarray    # (M, ...) host, unpadded

    def refer_rows(self, gids: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.refer[np.asarray(gids)])

    @classmethod
    def from_arrays(cls, host_target: np.ndarray, refer: np.ndarray,
                    names: Sequence[str], mesh: Mesh) -> "ShardedGalleryIndex":
        n = mesh.shape[AXIS_BANK]
        m = host_target.shape[0]
        assert m == len(names), (m, len(names))
        mp = -(-m // n) * n
        padded = host_target
        if mp != m:
            padded = np.zeros((mp, *host_target.shape[1:]),
                              host_target.dtype)
            padded[:m] = host_target
        return cls(target=put_bank(jnp.asarray(padded), mesh), refer=refer,
                   names=list(names), host_target=host_target)

    @classmethod
    def from_index(cls, index, mesh: Mesh) -> "ShardedGalleryIndex":
        return cls.from_arrays(np.asarray(index.target), index.refer,
                               index.names, mesh)


class ShardedRetrievalService(RetrievalService):
    """`RetrievalService` with the gallery sharded over `mesh`'s 'bank'
    axis. Accepts a dense `GalleryIndex` (sharded on entry) or a prebuilt
    `ShardedGalleryIndex`. Build the mesh with
    `parallel.mesh.make_mesh(data=1, bank=n_chips)`."""

    def __init__(self, backbone, params, index, mesh: Mesh, preprocess=None,
                 default_k: int = 10):
        assert AXIS_BANK in mesh.axis_names, mesh.axis_names
        self.mesh = mesh
        self._scorer_cache = {}
        if not isinstance(index, ShardedGalleryIndex):
            index = ShardedGalleryIndex.from_index(index, mesh)
        super().__init__(backbone, params, index, preprocess=preprocess,
                         default_k=default_k)

    # -- gallery management --------------------------------------------------
    def refresh_index(self, index) -> None:
        if not isinstance(index, ShardedGalleryIndex):
            index = ShardedGalleryIndex.from_index(index, self.mesh)
        super().refresh_index(index)

    def _extend_index(self, index, feats, names: Sequence[str]):
        return ShardedGalleryIndex.from_arrays(
            np.concatenate(
                [index.host_target,
                 np.asarray(feats["target"]).astype(
                     index.host_target.dtype)], axis=0),
            np.concatenate([index.refer, np.asarray(feats["refer"])],
                           axis=0),
            list(index.names) + list(names), self.mesh)

    # -- distributed scoring -------------------------------------------------
    def _make_scorer(self, kk: int):
        mesh = self.mesh
        score_queries = self.backbone.score_queries

        def local(q, tgt, gids, m_actual):
            # q (B, ...) replicated; tgt (M_loc, ...) this device's shard
            m_local = tgt.shape[0]
            off = jax.lax.axis_index(AXIS_BANK).astype(jnp.int32) * m_local
            rows = off + jnp.arange(m_local, dtype=jnp.int32)
            scores = score_queries(q, tgt)
            scores = jnp.where(rows[None, :] < m_actual, scores, -jnp.inf)
            scores = jnp.where(rows[None, :] == gids[:, None], -jnp.inf,
                               scores)
            vals, idx = jax.lax.top_k(scores, min(kk, m_local))
            return vals, idx.astype(jnp.int32) + off

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(AXIS_BANK), P(), P()),
            # concat per-shard (B, kk') candidates along dim 1
            out_specs=(P(None, AXIS_BANK), P(None, AXIS_BANK)))

        @jax.jit
        def run(queries, target, gids, m_actual):
            vals, ids = sharded(queries, target, gids, m_actual)
            merged_vals, pos = jax.lax.top_k(vals, kk)
            return merged_vals, jnp.take_along_axis(ids, pos, axis=1)

        return run

    def _score_topk(self, index, queries, gids, kk: int):
        scorer = self._scorer_cache.get(kk)
        if scorer is None:
            scorer = self._scorer_cache[kk] = self._make_scorer(kk)
        return scorer(queries, index.target,
                      jnp.asarray(np.asarray(gids), jnp.int32),
                      jnp.int32(len(index.names)))


class ShardedBatchingRetrievalService(BatchingRetrievalService,
                                      ShardedRetrievalService):
    """Micro-batching over the sharded gallery: concurrent queries coalesce
    into one distributed fuse+score+top-k dispatch. Construct with
    (backbone, params, index, mesh, ..., max_batch=, max_delay_s=)."""

