"""Feature memory banks: the core of "scaling negatives".

Parity target: `extract_bank_features` / `extract_refer_bank_features` /
`load_refer_bank` (`clip4cir/models.py:65-107`; per-backbone variants
`tgcir/models.py:223-270`, `blip4cir/models.py:45-93`,
`blip24cir/models.py:49-114`).

Design changes vs the reference (SURVEY.md §7):
  - The reference encodes the same frozen image up to three times (once per
    triplet role, once for the plus-mode refer bank). Since every bank entry
    is a pure function of one image under a frozen encoder, we make ONE pass
    over the deduplicated unique train images and derive all banks from it:
        image-keyed refer bank  = refer-form features
        target bank             = target-form (normalized/pooled) features
        triplet-keyed refer bank = refer_by_image[triplet.refer_image_id]
    (values identical to the reference's, incl. quirk §8.2: the target bank
    covers reference images too, because every unique train image is passed.)
  - The target bank lives in device HBM (it participates in every step's
    loss matmul); the refer bank stays in host RAM and is gathered per batch
    (refer rows can be huge for blip/blip2 token banks), replacing the
    reference's per-step CPU->GPU `.to(device)` of the full-batch slice
    (`clip4cir/models.py:133-138`).
  - Cache format is a compressed .npz instead of torch .pth; same semantics:
    recompute only if missing or `reload` (`clip4cir/models.py:66`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Bank:
    """refer: (N, *refer_shape) host array; target: (M, *target_shape)
    device array, L2-normalized.

    refer_key: 'image' when refer rows are keyed by unique image id (clip /
    tgcir / blip, and blip2 --plus); 'triplet' when keyed by triplet index
    (blip2 non-plus fusion states are caption-dependent,
    ref blip24cir/models.py:49-82 + quirk SURVEY.md §8.3)."""

    refer: np.ndarray
    target: jnp.ndarray
    refer_key: str = "image"

    @property
    def num_images(self) -> int:
        return self.target.shape[0]

    @staticmethod
    def cache_file(path: str) -> str:
        """np.savez_compressed appends '.npz' to extensionless paths; the
        exists-check and load must use the SAME resolved name or the cache
        never hits and the whole train set re-encodes every run."""
        return path if path.endswith(".npz") else path + ".npz"

    def gather_refer(self, batch: dict) -> np.ndarray:
        """Per-batch host gather of refer rows (fed to the jitted step);
        accepts an iter_train_bank batch dict and picks the right key."""
        ids = (batch["refer_image_id"] if self.refer_key == "image"
               else batch["triplet_idx"])
        return self.refer[ids]

    def save(self, path: str) -> None:
        path = Bank.cache_file(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(path, refer=self.refer,
                            target=np.asarray(self.target),
                            refer_key=np.asarray(self.refer_key))

    @classmethod
    def load(cls, path: str, device_target: bool = True) -> "Bank":
        data = np.load(cls.cache_file(path))
        target = data["target"]
        key = str(data["refer_key"]) if "refer_key" in data else "image"
        return cls(refer=data["refer"],
                   target=jnp.asarray(target) if device_target else target,
                   refer_key=key)


# ---------------------------------------------------------------------------
# Prepared-layout sidecar cache: the one-time kernel relayout of the frozen
# target bank (pre-pad/pre-transpose + int8 scales — ops/bank_kernels.py:
# PreparedBank, ops/maxquery_kernels.py:PreparedMaxQueryBank) persisted next
# to the raw bank cache, so later runs skip the per-run quantize+relayout
# entirely (cli/train.py loads this before the dtype-conversion step).
# ---------------------------------------------------------------------------

PREPARED_CACHE_VERSION = 2  # v2: producer-config `spec` string in the file


def prepared_cache_file(path: str, tag: str) -> str:
    base = Bank.cache_file(path)
    return base[: -len(".npz")] + f".prepared_{tag}.npz"


def _npz_array(a: np.ndarray):
    """(storable array, dtype tag) — npz can't serialize ml_dtypes bfloat16;
    view it as uint16 and record the real dtype."""
    a = np.asarray(a)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def _unnpz_array(a: np.ndarray, tag: str) -> np.ndarray:
    if tag == "bfloat16":
        import ml_dtypes

        return a.view(ml_dtypes.bfloat16)
    return a


def save_prepared_target(path: str, tag: str, prepared,
                         spec: str = "") -> str:
    """Persist a prepared target bank (flat or max-query, dense or int8).
    Uncompressed npz: this is a derived cache; IO speed over size.

    `spec` is an opaque producer-config string (bank dtype + backbone
    bank-spec, cli/train.py:prepared_spec) stored in the file and matched
    verbatim on load — the tag keys the FILENAME by --bank_dtype, but two
    configs that happen to share a tag and a target shape (e.g. a backbone
    swap onto the same --bank_path) must still miss, not silently load the
    other config's relayout."""
    from spn4cir_tpu.ops.bank_kernels import PreparedBank
    from spn4cir_tpu.ops.maxquery_kernels import PreparedMaxQueryBank

    f = prepared_cache_file(path, tag)
    os.makedirs(os.path.dirname(f) or ".", exist_ok=True)
    if isinstance(prepared, PreparedMaxQueryBank):
        values, vtag = _npz_array(prepared.qmd)
        kind = "maxq"
        scales = prepared.scales
    elif isinstance(prepared, PreparedBank):
        values, vtag = _npz_array(prepared.values)
        kind = "flat"
        scales = prepared.scales
    else:
        raise TypeError(f"not a prepared bank: {type(prepared)}")
    arrs = dict(values=values)
    if scales is not None:
        arrs["scales"] = np.asarray(scales, np.float32)
    np.savez(f, version=np.asarray(PREPARED_CACHE_VERSION),
             kind=np.asarray(kind), values_dtype=np.asarray(vtag),
             spec=np.asarray(spec),
             m_actual=np.asarray(prepared.m_actual), **arrs)
    return f


def load_prepared_target(path: str, tag: str, expected_shape,
                         spec: str = ""):
    """Load a prepared target bank, or None on miss/stale. `expected_shape`
    is the raw bank's (M, ...) target shape — a mismatch (the raw bank was
    re-extracted or extended differently) invalidates the sidecar; so does
    a `spec` string differing from the one recorded at save time."""
    f = prepared_cache_file(path, tag)
    if not os.path.exists(f):
        return None
    try:
        data = np.load(f)
        if int(data["version"]) != PREPARED_CACHE_VERSION:
            return None
        if str(data["spec"]) != spec:
            return None  # produced by a different config
        values = _unnpz_array(data["values"], str(data["values_dtype"]))
        scales = data["scales"] if "scales" in data else None
        m_actual = int(data["m_actual"])
        kind = str(data["kind"])
    except Exception:
        return None  # unreadable/truncated cache -> re-prepare
    if kind == "maxq":
        from spn4cir_tpu.ops.maxquery_kernels import PreparedMaxQueryBank

        prep = PreparedMaxQueryBank(
            jnp.asarray(values), m_actual,
            None if scales is None else jnp.asarray(scales))
    else:
        from spn4cir_tpu.ops.bank_kernels import PreparedBank

        prep = PreparedBank(
            jnp.asarray(values),
            None if scales is None else jnp.asarray(scales), m_actual)
    if tuple(prep.shape) != tuple(expected_shape):
        return None
    return prep


def extract_banks(
    bank_features_fn: Callable,
    image_batches: Iterator[Tuple[np.ndarray, np.ndarray]],
    num_images: int,
    cache_path: Optional[str] = None,
    reload: bool = False,
) -> Bank:
    """One frozen-encoder pass over unique train images -> Bank.

    bank_features_fn: jitted (images) -> (refer_feats, target_feats) for one
        batch; target_feats must already be L2-normalized.
    image_batches: yields (image_ids (B,), images (B, H, W, 3)); the last
        batch may be padded — ids < 0 are ignored.
    num_images: M, the unique (deduplicated) train image count.

    Caching parity with `clip4cir/models.py:66`: loads `cache_path` unless
    missing or `reload`.
    """
    if cache_path and os.path.exists(Bank.cache_file(cache_path)) and not reload:
        return Bank.load(cache_path)

    refer_buf = None
    target_buf = None
    for image_ids, images in image_batches:
        refer, target = jax.device_get(bank_features_fn(images))
        if refer_buf is None:
            refer_buf = np.zeros((num_images, *refer.shape[1:]), refer.dtype)
            target_buf = np.zeros((num_images, *target.shape[1:]), target.dtype)
        valid = image_ids >= 0
        refer_buf[image_ids[valid]] = refer[valid]
        target_buf[image_ids[valid]] = target[valid]
    if refer_buf is None:
        raise ValueError("no image batches supplied")

    bank = Bank(refer=refer_buf, target=jnp.asarray(target_buf),
                refer_key="image")
    if cache_path:
        bank.save(cache_path)
    return bank


def extract_fusion_banks(
    fusion_features_fn: Callable,
    triplet_batches: Iterator[dict],
    num_triplets: int,
    num_images: int,
    tokenize: Callable,
    cache_path: Optional[str] = None,
    reload: bool = False,
    by_image: bool = False,
) -> Bank:
    """Caption-aware bank extraction for fusion-form refer banks (blip2:
    fusion hidden states depend on the triplet caption,
    ref blip24cir/models.py:49-114).

    fusion_features_fn: jitted (images, text_ids) -> (refer_form, target_form)
        for one batch; for blip2: fusion hidden states + target query feats.
    triplet_batches: `iter_train_images` output.
    by_image: False -> refer bank keyed by triplet index (ref
        extract_bank_features); True -> keyed by image id, written for both
        the refer and target image of each triplet with that triplet's
        caption (ref extract_refer_bank_features, the --plus path).
    """
    if cache_path and os.path.exists(Bank.cache_file(cache_path)) and not reload:
        return Bank.load(cache_path)

    from spn4cir_tpu.data.transforms import RawBatch

    def _dev(images):
        # RawBatch (device-preprocess staging) rides into jit as a pytree;
        # the encoder wrapper (ops/preprocess.py:absorb_raw) unpacks it
        return images if isinstance(images, RawBatch) else jnp.asarray(images)

    refer_buf = None
    target_buf = None
    refer_rows = num_images if by_image else num_triplets
    for batch in triplet_batches:
        text_ids = jnp.asarray(tokenize(batch["captions"]))
        refer, target = jax.device_get(
            fusion_features_fn(_dev(batch["refer_images"]), text_ids))
        if by_image:
            refer_t, target_t = jax.device_get(
                fusion_features_fn(_dev(batch["target_images"]), text_ids))
        else:
            _, target_t = jax.device_get(
                fusion_features_fn(_dev(batch["target_images"]), text_ids))
        if refer_buf is None:
            refer_buf = np.zeros((refer_rows, *refer.shape[1:]), refer.dtype)
            target_buf = np.zeros((num_images, *target.shape[1:]), target.dtype)
        valid = batch["triplet_idx"] >= 0
        if by_image:
            refer_buf[batch["refer_image_id"][valid]] = refer[valid]
            refer_buf[batch["target_image_id"][valid]] = refer_t[valid]
        else:
            refer_buf[batch["triplet_idx"][valid]] = refer[valid]
        # target bank covers refer images too (quirk SURVEY.md par.8.2)
        target_buf[batch["refer_image_id"][valid]] = target[valid]
        target_buf[batch["target_image_id"][valid]] = target_t[valid]
    if refer_buf is None:
        raise ValueError("no batches supplied")

    bank = Bank(refer=refer_buf, target=jnp.asarray(target_buf),
                refer_key="image" if by_image else "triplet")
    if cache_path:
        bank.save(cache_path)
    return bank


def extract_unlabeled_features(encode_fn, batches, num_images: int,
                               cache_path: Optional[str] = None,
                               reload: bool = False) -> np.ndarray:
    """Encode the unlabeled pool -> normalized (U, D) features (negplus,
    ref clip4cir/models_negplus.py:100-117). Cached like the main banks."""
    if cache_path and os.path.exists(Bank.cache_file(cache_path)) and not reload:
        return np.load(Bank.cache_file(cache_path))["unlabeled"]
    buf = None
    for ids, images in batches:
        feats = jax.device_get(encode_fn(images))
        if buf is None:
            buf = np.zeros((num_images, *feats.shape[1:]), feats.dtype)
        valid = ids >= 0
        buf[ids[valid]] = feats[valid]
    if buf is None:
        raise ValueError("no unlabeled batches")
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, unlabeled=buf)
    return buf


def extend_target_bank(bank: Bank, unlabeled: np.ndarray,
                       neg_num: int = 0) -> Bank:
    """Append unlabeled negatives to the target bank (positives keep their
    ids in the first rows; ref models_negplus.py:118-125 — the reference
    truncates to the first `neg_num` rows when set)."""
    extra = unlabeled[:neg_num] if neg_num and neg_num > 0 else unlabeled
    target = jnp.concatenate([bank.target, jnp.asarray(extra)], axis=0)
    return Bank(refer=bank.refer, target=target, refer_key=bank.refer_key)
