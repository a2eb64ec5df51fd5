"""TG-CIR backbone: CLIP ViT-B/16 + token-learner attention + mask fusion.

Parity target: `tgcir/models.py` — `SpatialAttention`/`TokenLearner`
(`:21-49`), `Backbone.extract_img_fea`/`extract_text_fea` (`:52-139`),
`CIRPlus.img_txt_fusion` + gate MLP (`:163-205`), stage-2 surgery + freezing
(`:207-221`), token banks (`:223-270`).

TPU-native departures:
  - The reference's TokenLearner loops over S=8 separate conv modules and
    fills an *uninitialized cuda tensor* in place (quirk SURVEY.md §8.15);
    here it is one Dense(D->S) + sigmoid + einsum (functional, one MXU call).
  - The per-global-token mask loop (4 embedding lookups) is one (G, D)
    parameter broadcast.
  - Token sets stay (B, 12, 512) for bank parity: 4 global + 8 local.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.models.api import BankSpec, CIRBackbone, register_backbone
from spn4cir_tpu.models.clip import CLIP, CLIP_CONFIGS
from spn4cir_tpu.ops import infonce
from spn4cir_tpu.ops.bank_kernels import bank_infonce
from spn4cir_tpu.tokenizer import tokenize

HIDDEN = 512


class TokenLearner(nn.Module):
    """S spatial-attention tokens: w = sigmoid(Dense_1x1(x)) per slot, token_s
    = mean_l w[l,s] * x[l,:] (ref tgcir/models.py:21-49, vectorized)."""

    num_tokens: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, L, D)
        weights = jax.nn.sigmoid(
            nn.Dense(self.num_tokens, dtype=self.dtype, name="attn")(x))  # (B, L, S)
        return jnp.einsum("bls,bld->bsd", weights, x) / x.shape[1]


class GlobalMasks(nn.Module):
    """G learned ReLU'd masks over the pooled feature -> G global tokens
    (ref tgcir/models.py:64-70,96-107). Initialized to the reference's
    striped 0.1/1.0 pattern."""

    num_tokens: int = 4
    dim: int = HIDDEN

    def striped_init(self, key, shape, dtype=jnp.float32):
        g, d = shape
        arr = np.full(shape, 0.1, np.float32)
        seg = d // g
        for i in range(g):
            arr[i, i * seg : (i + 1) * seg] = 1.0
        return jnp.asarray(arr, dtype)

    @nn.compact
    def __call__(self, pooled):  # (B, D)
        masks = self.param("masks", self.striped_init, (self.num_tokens, self.dim))
        masks = nn.relu(masks).astype(pooled.dtype)
        return pooled[:, None, :] * masks[None]  # (B, G, D)


class GateMLP(nn.Module):
    """sigmoid(Dense(2D->D) -> ReLU -> Dense(D->1)) fusion gate
    (ref tgcir/models.py:165-170)."""

    hidden: int = HIDDEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(
            jnp.concatenate([a, b], axis=-1))
        return jax.nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="fc2")(nn.relu(h)))


class TGCIRModule(nn.Module):
    clip_model_name: str = "ViT-B/16"
    local_tokens: int = 8
    global_tokens: int = 4
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = CLIP_CONFIGS[self.clip_model_name]
        self.clip = CLIP(cfg, dtype=self.dtype, remat=self.remat)
        # hidden dim tracks the CLIP embed dim (512 for ViT-B/16, ref :151)
        hidden = cfg.embed_dim
        self.fc = nn.Dense(hidden, dtype=self.dtype)
        self.text_fc = nn.Dense(hidden, dtype=self.dtype)
        self.tokenlearn = TokenLearner(self.local_tokens, self.dtype)
        self.tokenlearn_text = TokenLearner(self.local_tokens, self.dtype)
        self.masks = GlobalMasks(self.global_tokens, hidden)
        self.masks_text = GlobalMasks(self.global_tokens, hidden)
        self.s_remain = GateMLP(hidden, self.dtype)

    def extract_img_fea(self, images):
        """(B, H, W, 3) -> (B, G+S, 512) token set (ref :78-111)."""
        pooled, tokens = self.clip.encode_image(images, return_tokens=True)
        global_tokens = self.masks(pooled)
        local = self.tokenlearn(self.fc(tokens))
        return jnp.concatenate([global_tokens, local], axis=1)

    def extract_text_fea(self, text_ids):
        """(B, L) ids -> (B, G+S, 512) token set (ref :113-139)."""
        pooled, tokens = self.clip.encode_text(text_ids, return_tokens=True)
        global_tokens = self.masks_text(pooled)
        local = self.tokenlearn_text(self.text_fc(tokens))
        return jnp.concatenate([global_tokens, local], axis=1)

    def img_txt_fusion(self, ref_tokens, text_ids):
        """Gate-blend reference vs text tokens, mean-pool, normalize
        (ref :198-205)."""
        mod_tokens = self.extract_text_fea(text_ids)
        remain = self.s_remain(ref_tokens, mod_tokens)  # (B, T, 1)
        fused = remain * ref_tokens + (1.0 - remain) * mod_tokens
        return infonce.l2_normalize(jnp.mean(fused.astype(jnp.float32), axis=1))

    def __call__(self, images, text_ids):
        ref = self.extract_img_fea(images)
        return self.img_txt_fusion(ref, text_ids)


class TgcirCIR(CIRBackbone):
    name = "tgcir"
    # the published FIQ eval ranks the FULL gallery for this backbone
    # (no reference-image filter, ref tgcir/validate.py:48-58)
    fiq_exclude_reference = False
    extend_suffix = "tgcir"
    default_transform = "targetpad"

    def __init__(self, clip_model_name: str = "ViT-B/16", tau: float = 0.02,
                 dtype=jnp.float32, remat: bool = False, **_):
        self.clip_model_name = clip_model_name
        self.tau = tau
        self.dtype = dtype
        self.cfg = CLIP_CONFIGS[clip_model_name]
        self.model = TGCIRModule(clip_model_name, dtype=dtype, remat=remat)
        self.input_dim = self.cfg.image_resolution
        self.hidden = self.cfg.embed_dim
        self.num_tokens = 12

    def init_params(self, rng):
        images = jnp.zeros((1, self.input_dim, self.input_dim, 3), self.dtype)
        text = jnp.zeros((1, self.cfg.context_length), jnp.int32)
        return self.model.init(rng, images, text)

    def bank_spec(self) -> BankSpec:
        return BankSpec((self.num_tokens, self.hidden), (self.hidden,))

    def encode_image(self, params, images):
        return self.model.apply(params, images, method="extract_img_fea")

    def gallery_features(self, params, images):
        """Raw token sets (B, 12, 512): eval fuses from these and pools for
        scoring (ref tgcir/utils.py:24-52 returns both; pooling happens in
        `_pooled_gallery`/`score_queries`)."""
        return self.encode_image(params, images)

    def bank_features(self, params, images):
        tokens = self.encode_image(params, images)
        pooled = infonce.l2_normalize(
            jnp.mean(tokens.astype(jnp.float32), axis=1))
        return tokens, pooled

    def index_features(self, params, images):
        """Eval (ref tgcir/utils.py:24-52): raw token sets for fusion, pooled
        normalized for scoring."""
        tokens, pooled = self.bank_features(params, images)
        return {"target": pooled, "refer": tokens}

    def encode_text(self, params, text_ids):
        return self.model.apply(params, text_ids, method="extract_text_fea")

    def fuse(self, params, refer_feats, text_ids):
        return self.model.apply(params, refer_feats, text_ids,
                                method="img_txt_fusion")

    def stage2_loss(self, params, refer_feats, text_ids, target_bank, labels,
                    *, neg_idx: Optional[jnp.ndarray] = None, impl: str = "auto"):
        query = self.fuse(params, refer_feats, text_ids)
        if neg_idx is not None:
            return infonce.sampled_neg_infonce(query, target_bank, labels,
                                               neg_idx, self.tau)
        return bank_infonce(query, target_bank, labels, self.tau, impl=impl)

    def tokenize(self, texts):
        return tokenize(texts, context_length=self.cfg.context_length,
                        truncate=True)

    def trainable_filter(self, path) -> bool:
        """Stage-2 freezes the image branch: clip.visual, fc, tokenlearn,
        masks (ref tgcir/models.py:213-221). Only the top-level module name
        is matched (masks_text/tokenlearn_text stay trainable even though
        their inner param names repeat 'masks')."""
        parts = [p for p in path if p != "params"]
        if not parts:
            return True
        root = parts[0]
        if root in ("fc", "tokenlearn", "masks"):
            return False
        if root == "clip" and len(parts) > 1 and parts[1] == "visual":
            return False
        return True

    @staticmethod
    def init_stage2(params):
        """Stage-2 surgery: deep-copy the (trained) image-branch tokenlearner
        and masks into the text branch (ref tgcir/models.py:210-212)."""
        import flax

        p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
        inner = dict(p["params"])
        inner["tokenlearn_text"] = jax.tree_util.tree_map(
            jnp.array, inner["tokenlearn"])
        inner["masks_text"] = jax.tree_util.tree_map(jnp.array, inner["masks"])
        p = dict(p)
        p["params"] = inner
        return p


@register_backbone("tgcir")
def _build_tgcir(**kw) -> TgcirCIR:
    return TgcirCIR(**kw)
