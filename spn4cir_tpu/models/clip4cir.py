"""clip4cir backbone: CLIP dual encoder + element-wise-sum combiner.

Behavioral parity target: `clip4cir/models.py:19-167` (`CIRPlus` with
`element_wise_sum` combining, frozen image tower in stage 2, full-bank
InfoNCE) and the zscir variant (`zscir/models.py`, ViT-L/14 default).

TPU-native: the query = normalize(refer + text) fusion and the bank loss run
as one jitted graph; the bank matmul dispatches to the blocked Pallas kernel
on TPU (`spn4cir_tpu.ops.bank_kernels`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spn4cir_tpu.models.api import BankSpec, CIRBackbone, register_backbone
from spn4cir_tpu.models.clip import build_clip
from spn4cir_tpu.ops import infonce
from spn4cir_tpu.ops.bank_kernels import bank_infonce
from spn4cir_tpu.tokenizer import tokenize


class ClipCIR(CIRBackbone):
    name = "clip"
    extend_suffix = "clip"
    default_transform = "targetpad"

    def __init__(self, clip_model_name: str = "RN50x4", tau: float = 0.02,
                 dtype=jnp.float32, remat: bool = False):
        self.clip_model_name = clip_model_name
        self.tau = tau
        self.dtype = dtype
        self.model, self.cfg = build_clip(clip_model_name, dtype=dtype, remat=remat)
        self.input_dim = self.cfg.image_resolution
        self.embed_dim = self.cfg.embed_dim

    # ---- construction ----
    def init_params(self, rng):
        images = jnp.zeros((1, self.input_dim, self.input_dim, 3), self.dtype)
        text = jnp.zeros((1, self.cfg.context_length), jnp.int32)
        variables = self.model.init(rng, images, text)
        return variables

    def bank_spec(self) -> BankSpec:
        return BankSpec((self.embed_dim,), (self.embed_dim,))

    # ---- encoders ----
    def encode_image(self, params, images):
        return self.model.apply(params, images, method="encode_image")

    def gallery_features(self, params, images):
        feats = self.encode_image(params, images)
        return infonce.l2_normalize(feats.astype(jnp.float32))

    def encode_text(self, params, text_ids):
        return self.model.apply(params, text_ids, method="encode_text")

    def bank_features(self, params, images):
        """Single encode serving both bank forms: refer = raw feats, target =
        normalized (the reference recomputes these separately,
        clip4cir/models.py:65-104)."""
        feats = self.encode_image(params, images)
        return feats, infonce.l2_normalize(feats.astype(jnp.float32))

    def index_features(self, params, images):
        """Eval parity (clip4cir/utils.py:24-50 + validate.py:28,88-94): the
        fusion-side refer lookup uses the RAW encode_image output; only the
        scoring gallery is normalized."""
        feats = self.encode_image(params, images)
        return {"target": infonce.l2_normalize(feats.astype(jnp.float32)),
                "refer": feats}

    # ---- fusion ----
    def combine(self, refer_feats, text_feats):
        """element_wise_sum combiner (ref clip4cir/models.py:54-56)."""
        return infonce.l2_normalize(
            refer_feats.astype(jnp.float32) + text_feats.astype(jnp.float32))

    def fuse(self, params, refer_feats, text_ids):
        return self.combine(refer_feats, self.encode_text(params, text_ids))

    # ---- losses ----
    def stage2_loss(self, params, refer_feats, text_ids, target_bank, labels,
                    *, neg_idx: Optional[jnp.ndarray] = None, impl: str = "auto"):
        query = self.fuse(params, refer_feats, text_ids)
        if neg_idx is not None:
            return infonce.sampled_neg_infonce(query, target_bank, labels, neg_idx, self.tau)
        return bank_infonce(query, target_bank, labels, self.tau, impl=impl)

    def stage1_loss(self, params, images_refer, images_target, text_ids):
        """In-batch InfoNCE training the full model end-to-end
        (ref clip4cir/models.py:146-161, `wo_bank=True` branch). Refer and
        target ride ONE 2B-batch tower call: per-sample math is identical
        to two B-batch calls, and the doubled GEMM batch keeps the MXU
        fuller through fwd+bwd."""
        b = images_refer.shape[0]
        both = self.encode_image(
            params, jnp.concatenate([images_refer, images_target], axis=0))
        refer = both[:b]
        target = infonce.l2_normalize(both[b:].astype(jnp.float32))
        query = self.combine(refer, self.encode_text(params, text_ids))
        return infonce.in_batch_infonce(query, target, self.tau)

    def stage1_negtype_loss(self, params, images_refer, images_target,
                            text_ids, neg_type: int = 15):
        """Negative-type ablation: the 4-flavor loss averaged by bitmask
        (ref clip4cir/models_negtype.py:94-128; bit0=refer, bit1=text,
        bit2=target, bit3=query)."""
        refer = self.encode_image(params, images_refer).astype(jnp.float32)
        target = infonce.l2_normalize(
            self.encode_image(params, images_target).astype(jnp.float32))
        text = self.encode_text(params, text_ids).astype(jnp.float32)
        losses = infonce.negtype_losses(refer, text, target, self.tau)
        return infonce.combine_negtype(losses, neg_type)

    # ---- host helpers ----
    def tokenize(self, texts):
        return tokenize(texts, context_length=self.cfg.context_length, truncate=True)


@register_backbone("clip")
def _build_clip_cir(**kw) -> ClipCIR:
    return ClipCIR(**kw)


@register_backbone("zs")
def _build_zs_cir(clip_model_name: str = "ViT-L/14", tau: float = 0.01, **kw) -> ClipCIR:
    """zscir uses the same CLIP architecture with ViT-L/14 defaults
    (ref zscir/train.py:211)."""
    b = ClipCIR(clip_model_name=clip_model_name, tau=tau, **kw)
    b.name = "zs"
    b.extend_suffix = "zs"
    # zero-shot trains on generated triplets ONLY (quirk: the zscir loaders
    # REPLACE the human train triplets with cap.extend_zs / cap.cc and do
    # so without a flag gate — zscir/data_utils.py:151-157)
    b.replace_extended = True
    return b
