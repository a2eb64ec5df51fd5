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

from spn4cir_tpu.parallel.mesh import AXIS_BANK, bank_sharding, put_bank
from spn4cir_tpu.serve.service import (
    BatchingRetrievalService,
    RetrievalService,
    quantized_score_queries,
)


@dataclasses.dataclass
class ShardedGalleryIndex:
    """Gallery index with `target` padded to the shard count and laid out
    row-sharded over the mesh's 'bank' axis. `host_target` keeps the
    unpadded features host-side so mutations (add_images / refresh) can
    rebuild the sharded layout without a device round-trip."""

    target: object             # (Mp, ...) device array or int8 QuantBank,
                               # rows (and scales) sharded over 'bank'
    refer: np.ndarray          # (M, ...) host, fusion lookup
    names: List[str]
    host_target: object        # (M, ...) host array / QuantBank, unpadded

    def refer_rows(self, gids: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.refer[np.asarray(gids)])

    @classmethod
    def from_arrays(cls, host_target, refer: np.ndarray,
                    names: Sequence[str], mesh: Mesh) -> "ShardedGalleryIndex":
        """host_target: (M, ...) np array, or an int8 `QuantBank` of host
        arrays (values + per-row scales shard together)."""
        from spn4cir_tpu.ops.bank_kernels import QuantBank

        n = mesh.shape[AXIS_BANK]
        m = host_target.shape[0]
        assert m == len(names), (m, len(names))
        mp = -(-m // n) * n

        def pad(a):
            if mp == m:
                return a
            out = np.zeros((mp, *a.shape[1:]), a.dtype)
            out[:m] = a
            return out

        if isinstance(host_target, QuantBank):
            target = jax.device_put(
                QuantBank(jnp.asarray(pad(np.asarray(host_target.values))),
                          jnp.asarray(pad(np.asarray(host_target.scales)))),
                bank_sharding(mesh))
        else:
            target = put_bank(jnp.asarray(pad(host_target)), mesh)
        return cls(target=target, refer=refer, names=list(names),
                   host_target=host_target)

    @classmethod
    def from_index(cls, index, mesh: Mesh) -> "ShardedGalleryIndex":
        from spn4cir_tpu.ops.bank_kernels import QuantBank

        target = index.target
        if isinstance(target, QuantBank):
            host = QuantBank(np.asarray(target.values),
                             np.asarray(target.scales))
        else:
            host = np.asarray(target)
        return cls.from_arrays(host, index.refer, index.names, mesh)


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
        from spn4cir_tpu.ops.bank_kernels import QuantBank, quantize_bank

        host = index.host_target
        if isinstance(host, QuantBank):
            new = quantize_bank(feats["target"])
            grown = QuantBank(
                np.concatenate([np.asarray(host.values),
                                np.asarray(new.values)], axis=0),
                np.concatenate([np.asarray(host.scales),
                                np.asarray(new.scales)], axis=0))
        else:
            grown = np.concatenate(
                [host, np.asarray(feats["target"]).astype(host.dtype)],
                axis=0)
        return ShardedGalleryIndex.from_arrays(
            grown,
            np.concatenate([index.refer, np.asarray(feats["refer"])],
                           axis=0),
            list(index.names) + list(names), self.mesh)

    # -- distributed scoring -------------------------------------------------
    def _make_scorer(self, kk: int, quant: bool):
        from spn4cir_tpu.parallel.loss import bank_in_spec

        mesh = self.mesh
        score_queries = self.backbone.score_queries

        def local(q, tgt, gids, m_actual):
            # q (B, ...) replicated; tgt (M_loc, ...) this device's shard
            m_local = tgt.shape[0]
            off = jax.lax.axis_index(AXIS_BANK).astype(jnp.int32) * m_local
            rows = off + jnp.arange(m_local, dtype=jnp.int32)
            scores = (quantized_score_queries(q, tgt) if quant
                      else score_queries(q, tgt))
            scores = jnp.where(rows[None, :] < m_actual, scores, -jnp.inf)
            scores = jnp.where(rows[None, :] == gids[:, None], -jnp.inf,
                               scores)
            vals, idx = jax.lax.top_k(scores, min(kk, m_local))
            return vals, idx.astype(jnp.int32) + off

        bank_spec = bank_in_spec(self.index.target) if quant else P(AXIS_BANK)
        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), bank_spec, P(), P()),
            # concat per-shard (B, kk') candidates along dim 1
            out_specs=(P(None, AXIS_BANK), P(None, AXIS_BANK)))

        @jax.jit
        def run(queries, target, gids, m_actual):
            vals, ids = sharded(queries, target, gids, m_actual)
            merged_vals, pos = jax.lax.top_k(vals, kk)
            return merged_vals, jnp.take_along_axis(ids, pos, axis=1)

        return run

    def _score_topk(self, index, queries, gids, kk: int):
        from spn4cir_tpu.ops.bank_kernels import QuantBank

        quant = isinstance(index.target, QuantBank)
        key = (kk, quant)
        scorer = self._scorer_cache.get(key)
        if scorer is None:
            scorer = self._scorer_cache[key] = self._make_scorer(kk, quant)
        return scorer(queries, index.target,
                      jnp.asarray(np.asarray(gids), jnp.int32),
                      jnp.int32(len(index.names)))


class ShardedBatchingRetrievalService(BatchingRetrievalService,
                                      ShardedRetrievalService):
    """Micro-batching over the sharded gallery: concurrent queries coalesce
    into one distributed fuse+score+top-k dispatch. Construct with
    (backbone, params, index, mesh, ..., max_batch=, max_delay_s=)."""

