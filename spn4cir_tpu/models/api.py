"""The backbone protocol: the one interface L2-L5 are parameterized by.

The reference implements its data/bank/train/eval layers five times, once per
backbone tree (SURVEY.md §1). Here every backbone exposes this protocol and
the shared core is written once. The de-facto interface being formalized is
the reference's `CIRPlus` surface: `encode_image` / `encode_text` /
`combining_function` / `img_txt_fusion` / `extract_bank_features` /
`load_ckpt` (`clip4cir/models.py:19`, `tgcir/models.py:142`,
`blip4cir/models.py:16`, `blip24cir/models.py:14`).

All methods are pure functions of explicit `params` pytrees (functional
state, SURVEY.md §7 decision 3) and are jit/pjit-safe.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

Params = Any
Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BankSpec:
    """Shape metadata for the feature memory banks (SURVEY.md §7 decision 1).

    refer_shape / target_shape exclude the leading bank axis. clip: (D,) /
    (D,); tgcir: (12, 512) / (512,); blip: (577, 768) / (256,);
    blip2: (32, 768) / (32, 256).
    """

    refer_shape: Tuple[int, ...]
    target_shape: Tuple[int, ...]
    dtype: Any = jnp.float32


class CIRBackbone(abc.ABC):
    """A CIR backbone: encoders + fusion + stage-2 loss, as pure functions."""

    #: registry key and extended-caption filename infix
    #: (`cap.extend_{suffix}.train.json`, SURVEY.md §8 quirk 1)
    name: str = ""
    extend_suffix: str = ""
    #: zscir semantics: generated triplets REPLACE the human train set
    #: (zero-shot — zscir/data_utils.py:151-157 assigns where clip4cir
    #: appends) and load unconditionally on the train split
    replace_extended: bool = False
    #: input resolution for the image tower
    input_dim: int = 224
    #: default --transform flag value (reference CLI parity)
    default_transform: str = "targetpad"

    # ---- construction ----
    @abc.abstractmethod
    def init_params(self, rng) -> Params:
        ...

    @abc.abstractmethod
    def bank_spec(self) -> BankSpec:
        ...

    # ---- encoders (jit-safe, take device arrays) ----
    @abc.abstractmethod
    def encode_image(self, params: Params, images: Array) -> Array:
        """Images (B, H, W, 3) -> refer-side features (bank refer_shape)."""

    @abc.abstractmethod
    def gallery_features(self, params: Params, images: Array) -> Array:
        """Images -> L2-normalized gallery/target features (target_shape)."""

    def bank_features(self, params: Params, images: Array) -> Tuple[Array, Array]:
        """One-image-batch (refer_form, target_form) features for bank
        extraction (SURVEY.md §7: one pass over unique images)."""
        return (self.encode_image(params, images),
                self.gallery_features(params, images))

    def index_features(self, params: Params, images: Array) -> Dict[str, Array]:
        """Per-gallery-image arrays for eval: 'target' is score-ready
        (normalized/pooled); 'refer' is the fusion-side lookup — eval reuses
        gallery features for query references, never a fresh encode (quirk
        SURVEY.md §8.8). Backbones whose refer form differs from the scoring
        form (raw token sets for tgcir/blip/blip2) override this."""
        feats = self.gallery_features(params, images)
        return {"target": feats, "refer": feats}

    @abc.abstractmethod
    def encode_text(self, params: Params, text_ids: Array) -> Array:
        """Tokenized text -> text features (backbone-specific shape)."""

    @abc.abstractmethod
    def fuse(self, params: Params, refer_feats: Array, text_ids: Array) -> Array:
        """(refer-side feats, text ids) -> L2-normalized query features.

        Mirrors `combining_function` / `img_txt_fusion` per backbone.
        """

    # ---- losses ----
    @abc.abstractmethod
    def stage2_loss(
        self,
        params: Params,
        refer_feats: Array,
        text_ids: Array,
        target_bank: Array,
        labels: Array,
        *,
        neg_idx: Optional[Array] = None,
        impl: str = "auto",
    ) -> Array:
        """Full-bank (or sampled-negative) InfoNCE on cached refer feats."""

    # ---- host-side helpers ----
    @abc.abstractmethod
    def tokenize(self, texts) -> Array:
        """Host tokenization to fixed-length int32 ids."""

    # The published FIQ eval filters the reference image from rankings only
    # for clip4cir/zscir (validate.py:40); tgcir/blip/blip2 rank the full
    # gallery and override this to False.
    fiq_exclude_reference = True

    def score_queries(self, query_feats: Array, gallery: Array) -> Array:
        """Similarity matrix used for retrieval eval; default = cosine dot."""
        return jnp.dot(query_feats, gallery.T, preferred_element_type=jnp.float32)

    # ---- optimization ----
    def optimizer_kwargs(self) -> Dict[str, Any]:
        """Per-backbone AdamW hyperparameters (ref clip4cir/train.py:79-85;
        blip24cir uses betas (0.9, 0.98), wd 0.05 — SURVEY.md §2.1)."""
        return {"b1": 0.9, "b2": 0.999, "eps": 1e-7, "weight_decay": 1e-2}

    # ---- trainability ----
    def trainable_filter(self, path: Tuple[str, ...]) -> bool:
        """True if the param at `path` trains in stage 2 (image tower frozen,
        ref clip4cir/models.py:31-33)."""
        return "visual" not in path


_REGISTRY: Dict[str, Callable[..., CIRBackbone]] = {}


def register_backbone(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


def build_backbone(name: str, **kw) -> CIRBackbone:
    if name not in _REGISTRY:
        # import for side-effect registration
        import spn4cir_tpu.models.clip4cir  # noqa: F401
        try:
            import spn4cir_tpu.models.tgcir  # noqa: F401
            import spn4cir_tpu.models.blip4cir  # noqa: F401
            import spn4cir_tpu.models.blip24cir  # noqa: F401
            import spn4cir_tpu.models.zscir  # noqa: F401
        except ImportError:
            pass
    if name not in _REGISTRY:
        raise KeyError(f"unknown backbone {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kw)


def available_backbones():
    return sorted(_REGISTRY)
