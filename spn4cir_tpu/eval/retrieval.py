"""Gallery indexing + query prediction + validation drivers.

Parity targets: `extract_index_features` (`clip4cir/utils.py:24-50` single
array; `blip4cir/utils.py:24-68` raw+pooled pair; `tgcir/utils.py:24-52`
token+pooled pair), `generate_{fiq,cirr}_val_predictions` /
`compute_*_val_metrics` (`clip4cir/validate.py`), `fiq_val_retrieval` /
`cirr_val_retrieval` (`clip4cir/validate.py:54-66,216-231`).

TPU-native: gallery encode is one jitted function over fixed-size batches
producing a dict of index arrays — 'target' (score-ready) and 'refer'
(fusion-side lookup). Query reference features are gathered from the index
by integer id (quirk SURVEY.md §8.8 — eval reuses gallery features for
references, never a fresh encode); scoring/ranking runs on device via
`spn4cir_tpu.eval.metrics` (no argsort, no string masks). Index buffers live
in host RAM (token-shaped refer indexes reach tens of GB — the reference
spills them to CPU too, quirk §8.12); the scoring gallery is moved to device
once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.data.datasets import CIRDataset, iter_gallery, iter_relative_eval
from spn4cir_tpu.eval import metrics as M
from spn4cir_tpu.models.api import CIRBackbone


@dataclasses.dataclass
class GalleryIndex:
    """Extracted gallery features: 'target' (device, score-ready) +
    'refer' (host, fusion lookup) + names."""

    target: jnp.ndarray
    refer: np.ndarray
    names: List[str]

    def refer_rows(self, gids: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.refer[np.asarray(gids)])

    # -- persistence (serving restarts skip the gallery re-encode; same
    # cache semantics as Bank: .npz, recompute only if missing) ------------
    def save(self, path: str) -> None:
        import os

        from spn4cir_tpu.bank.bank import Bank
        from spn4cir_tpu.ops.bank_kernels import QuantBank

        path = Bank.cache_file(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        extra = {}
        if isinstance(self.target, QuantBank):
            extra = {"target": np.asarray(self.target.values),
                     "target_scales": np.asarray(self.target.scales)}
        else:
            extra = {"target": np.asarray(self.target)}
        np.savez_compressed(path, refer=self.refer,
                            names=np.asarray(self.names), **extra)

    @classmethod
    def load(cls, path: str) -> "GalleryIndex":
        from spn4cir_tpu.bank.bank import Bank
        from spn4cir_tpu.ops.bank_kernels import QuantBank

        data = np.load(Bank.cache_file(path))
        if "target_scales" in data:
            target = QuantBank(jnp.asarray(data["target"]),
                               jnp.asarray(data["target_scales"]))
        else:
            target = jnp.asarray(data["target"])
        return cls(target=target, refer=data["refer"],
                   names=[str(n) for n in data["names"]])


def _backbone_jit(backbone, key: str, make):
    """Per-backbone cache of jitted callables. A fresh `jax.jit(lambda ...)`
    per eval call never hits jax's own cache (keyed on callable identity),
    so every per-epoch validation would retrace + recompile the towers and
    accumulate live executables."""
    cache = getattr(backbone, "_jit_cache", None)
    if cache is None:
        cache = {}
        try:
            backbone._jit_cache = cache
        except AttributeError:  # pragma: no cover — frozen/slots backbone
            return make()
    if key not in cache:
        cache[key] = make()
    return cache[key]


def extract_index_features(
    backbone: CIRBackbone,
    params,
    dataset: CIRDataset,
    batch_size: int = 32,
    num_workers: int = 4,
    mesh=None,
) -> GalleryIndex:
    """Gallery encode; with `mesh`, images shard over the 'data' axis and
    each device encodes its slice (multi-chip indexing, SURVEY.md §7
    decision 5 — mirrors the reference's single-GPU scan at
    clip4cir/utils.py:24). batch_size must divide the data-axis size.

    A mesh with a 'model' axis (parallel/tp.py:make_tp_mesh) additionally
    tensor-shards the tower params Megatron-style — data parallel × tensor
    parallel indexing for the big towers (EVA-g)."""
    from spn4cir_tpu.data.prefetch import prefetch
    from spn4cir_tpu.data.transforms import RawBatch, RawStageTransform

    raw_kind = (dataset.preprocess.kind
                if isinstance(dataset.preprocess, RawStageTransform) else None)

    def tower(p, imgs):
        """Encode, absorbing the device half of the preprocess when the
        dataset stages raw canvases (`--device_preprocess`): resize/crop/
        normalize fuse with the tower under the same jit."""
        if raw_kind is not None:
            from spn4cir_tpu.ops.preprocess import preprocess_batch_dynamic

            imgs = preprocess_batch_dynamic(imgs[0], imgs[1],
                                            backbone.input_dim, raw_kind)
        return backbone.index_features(p, imgs)

    def to_device(images):
        if raw_kind is not None:
            return (jnp.asarray(images.canvas), jnp.asarray(images.extents))
        return jnp.asarray(images)

    if mesh is not None and "model" in mesh.axis_names and \
            mesh.shape["model"] > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from spn4cir_tpu.parallel.tp import (shard_params_tp,
                                             tp_param_shardings)

        # Cache the jitted fn per mesh shape (retracing every eval call
        # recompiles the tower); params are re-sharded per call — a no-op
        # placement when already laid out — because per-epoch validation
        # passes freshly trained params.
        batch_shard = NamedSharding(mesh, P("data"))
        in_batch = ((batch_shard, batch_shard) if raw_kind is not None
                    else batch_shard)
        jitted = _backbone_jit(
            backbone,
            f"index_features_tp_{tuple(mesh.shape.items())}_{raw_kind}",
            lambda: jax.jit(
                tower,
                in_shardings=(tp_param_shardings(params, mesh), in_batch),
                out_shardings=NamedSharding(mesh, P()),
            ))
        encode = functools.partial(jitted, shard_params_tp(params, mesh))
    elif mesh is not None:
        from spn4cir_tpu.parallel.mesh import batch_sharding, replicated

        bs = batch_sharding(mesh)
        encode = jax.jit(
            lambda imgs: tower(params, imgs),
            in_shardings=((bs, bs) if raw_kind is not None else bs,),
            out_shardings=replicated(mesh),
        )
    else:
        jitted = _backbone_jit(backbone, f"index_features_{raw_kind}",
                               lambda: jax.jit(tower))
        encode = functools.partial(jitted, params)
    names = dataset.gallery_names
    bufs: Dict[str, np.ndarray] = {}
    for ids, images in prefetch(iter_gallery(dataset, batch_size, num_workers),
                                depth=2):
        out = jax.device_get(encode(to_device(images)))
        if not bufs:
            bufs = {k: np.zeros((len(names), *v.shape[1:]), v.dtype)
                    for k, v in out.items()}
        valid = ids >= 0
        for k, v in out.items():
            bufs[k][ids[valid]] = v[valid]
    if not bufs:
        raise ValueError("empty gallery")
    return GalleryIndex(target=jnp.asarray(bufs["target"]),
                        refer=bufs["refer"], names=list(names))


def generate_val_predictions(
    backbone: CIRBackbone,
    params,
    dataset: CIRDataset,
    index: GalleryIndex,
    batch_size: int = 32,
) -> Dict[str, np.ndarray]:
    """Queries -> fused features + id arrays. Reference features come from
    the gallery index (quirk §8.8). Returns query_feats, refer_gid,
    target_gid (+ member_gids, pairid for CIRR)."""
    jitted_fuse = _backbone_jit(
        backbone, "fuse",
        lambda: jax.jit(lambda p, r, t: backbone.fuse(p, r, t)))
    fuse = functools.partial(jitted_fuse, params)
    chunks, refer, target, members, pairids = [], [], [], [], []
    for batch in iter_relative_eval(dataset, batch_size,
                                    gallery_names=index.names):
        text_ids = jnp.asarray(backbone.tokenize(batch["captions"]))
        pad = batch_size - len(batch["captions"])
        ref_feats = index.refer_rows(batch["refer_gid"])
        if pad:  # keep one jit specialization for the ragged tail
            text_ids = jnp.pad(text_ids, ((0, pad),) + ((0, 0),) * (text_ids.ndim - 1))
            ref_feats = jnp.pad(ref_feats, ((0, pad),) + ((0, 0),) * (ref_feats.ndim - 1))
        out = jax.device_get(fuse(ref_feats, text_ids))
        chunks.append(out[: len(batch["captions"])])
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


def query_scores(backbone: CIRBackbone, preds: Dict[str, np.ndarray],
                 index: GalleryIndex) -> jnp.ndarray:
    return backbone.score_queries(jnp.asarray(preds["query_feats"]), index.target)


def fiq_val_retrieval(
    backbone: CIRBackbone,
    params,
    data_path: str,
    dress_type: str,
    preprocess,
    batch_size: int = 32,
    index: Optional[GalleryIndex] = None,
    fiq_val_type: int = 0,
    mesh=None,
) -> Dict[str, float]:
    # fiq_val_type selects the gallery image list (0=image_splits, 1=VAL-set
    # only); the relative query set is unaffected (ref validate.py:102-108).
    classic = CIRDataset("fiq", "val", "classic", preprocess, data_path,
                         [dress_type], fiq_val_type=fiq_val_type)
    relative = CIRDataset("fiq", "val", "relative", preprocess, data_path, [dress_type])
    if index is None:
        index = extract_index_features(backbone, params, classic, batch_size,
                                       mesh=mesh)
    preds = generate_val_predictions(backbone, params, relative, index, batch_size)
    scores = query_scores(backbone, preds, index)
    # FIQ reference exclusion is per-backbone in the published eval (only
    # clip4cir/zscir filter it; see metrics.target_ranks citations)
    refer = (jnp.asarray(preds["refer_gid"])
             if getattr(backbone, "fiq_exclude_reference", True) else None)
    return M.fiq_metrics(scores, jnp.asarray(preds["target_gid"]), refer)


def cirr_val_retrieval(
    backbone: CIRBackbone,
    params,
    data_path: str,
    preprocess,
    batch_size: int = 32,
    index: Optional[GalleryIndex] = None,
    mesh=None,
) -> Dict[str, float]:
    classic = CIRDataset("cirr", "val", "classic", preprocess, data_path)
    relative = CIRDataset("cirr", "val", "relative", preprocess, data_path)
    if index is None:
        index = extract_index_features(backbone, params, classic, batch_size,
                                       mesh=mesh)
    preds = generate_val_predictions(backbone, params, relative, index, batch_size)
    scores = query_scores(backbone, preds, index)
    return M.cirr_metrics(scores, jnp.asarray(preds["target_gid"]),
                          jnp.asarray(preds["refer_gid"]),
                          jnp.asarray(preds["member_gids"]))
