"""blip4cir backbone: BLIP ViT + MED BERT cross-attention fusion.

Parity targets: `blip4cir/blip_cir.py` (`BLIP_Retrieval`: img_embed,
img_txt_fusion with the enc-token swap, vision_proj/text_proj 768->256,
init_stage2 freezing ViT + vision_proj) and `blip4cir/models.py` (`CIRPlus`
with *learnable* tau — quirk SURVEY.md §8.10 — and token-shaped banks:
refer (577, 768) raw ViT tokens, target (256,) pooled).

TPU-native: the HF BertTokenizer becomes the clean-room WordPiece tokenizer;
fusion + bank loss compile into one jit; the learnable tau lives in the
params pytree (functional state)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spn4cir_tpu.models.api import BankSpec, CIRBackbone, register_backbone
from spn4cir_tpu.models.blip_vit import BlipViT, BlipViTConfig
from spn4cir_tpu.models.med import MedBert, MedConfig
from spn4cir_tpu.ops import infonce
from spn4cir_tpu.ops.bank_kernels import bank_infonce
from spn4cir_tpu.tokenizer.wordpiece import BertTokenizer, tiny_test_vocab

EMBED_DIM = 256
TEXT_MAX_LEN = 35  # BLIP4CIR tokenizes with padding='longest'; 35 covers CIR


class BlipCirModule(nn.Module):
    vit_cfg: BlipViTConfig
    med_cfg: MedConfig
    embed_dim: int = EMBED_DIM
    tau_init: float = 0.03
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.visual_encoder = BlipViT(self.vit_cfg, self.dtype, self.remat)
        self.text_encoder = MedBert(self.med_cfg, self.dtype)
        self.vision_proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.text_proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        # learnable temperature (ref blip4cir/models.py:29)
        self.tau = self.param("tau", nn.initializers.constant(self.tau_init), ())

    def img_embed(self, images):
        """(B, H, W, 3) -> raw ViT tokens (B, 577, 768)
        (ref blip_cir.py:54-70)."""
        return self.visual_encoder(images)

    def img_pooled(self, tokens):
        """CLS token -> vision_proj -> normalize (ref blip_cir.py:63)."""
        return infonce.l2_normalize(
            self.vision_proj(tokens[:, 0, :]).astype(jnp.float32))

    def text_only(self, input_ids, attention_mask):
        """Self-attention-only text feature (no cross-attn), CLS -> text_proj."""
        hidden = self.text_encoder(input_ids, attention_mask=attention_mask)
        return infonce.l2_normalize(
            self.text_proj(hidden[:, 0, :]).astype(jnp.float32))

    def img_txt_fusion(self, ref_tokens, input_ids, attention_mask,
                       deterministic: bool = True):
        """Text encoder cross-attends to reference image tokens; CLS ->
        text_proj -> normalized query (ref blip_cir.py:82-107). input_ids
        must already carry the enc-token swap at position 0.
        deterministic=False enables MED dropout (the reference's stage-2
        trains the live text side in torch train mode)."""
        img_mask = jnp.ones(ref_tokens.shape[:-1], jnp.int32)
        hidden = self.text_encoder(
            input_ids, attention_mask=attention_mask,
            encoder_hidden_states=ref_tokens.astype(self.dtype),
            encoder_attention_mask=img_mask, deterministic=deterministic)
        return infonce.l2_normalize(
            self.text_proj(hidden[:, 0, :]).astype(jnp.float32))

    def __call__(self, images, input_ids, attention_mask):
        tokens = self.img_embed(images)
        return self.img_txt_fusion(tokens, input_ids, attention_mask)

    def init_all(self, images, input_ids, attention_mask):
        """Init-time tracer touching every parameterized path (flax only
        materializes params for traced modules)."""
        tokens = self.img_embed(images)
        pooled = self.img_pooled(tokens)
        fused = self.img_txt_fusion(tokens, input_ids, attention_mask)
        return pooled, fused, self.tau


class BlipCIR(CIRBackbone):
    name = "blip"
    # the published FIQ eval ranks the FULL gallery for this backbone
    # (no reference-image filter, ref blip4cir/validate.py:40-52)
    fiq_exclude_reference = False
    extend_suffix = "blip"
    default_transform = "targetpad"

    def __init__(self, blip_size: str = "base", tau: float = 0.03,
                 dtype=jnp.float32, remat: bool = False,
                 bert_vocab_path: Optional[str] = None,
                 med_cfg: Optional[MedConfig] = None,
                 vit_cfg: Optional[BlipViTConfig] = None,
                 dropout: float = 0.0, text_max_len: int = TEXT_MAX_LEN, **_):
        if vit_cfg is None:
            vit_cfg = (BlipViTConfig.tiny() if blip_size == "test-tiny"
                       else BlipViTConfig.large() if blip_size == "large"
                       else BlipViTConfig.base())
        if blip_size == "test-tiny":
            self.tokenizer = BertTokenizer(vocab=tiny_test_vocab())
            med_cfg = med_cfg or MedConfig.tiny(self.tokenizer.vocab_size)
        else:
            self.tokenizer = BertTokenizer(vocab_path=bert_vocab_path)
            med_cfg = med_cfg or MedConfig(vocab_size=self.tokenizer.vocab_size,
                                           encoder_width=vit_cfg.width)
        if dropout:
            import dataclasses as _dc
            med_cfg = _dc.replace(med_cfg, dropout_rate=dropout)
        self.vit_cfg = vit_cfg
        self.med_cfg = med_cfg
        self.tau = tau  # init value; live value is params['params']['tau']
        self.dtype = dtype
        self.model = BlipCirModule(vit_cfg, med_cfg, EMBED_DIM, tau,
                                   dtype=dtype, remat=remat)
        self.input_dim = vit_cfg.image_size
        self.embed_dim = EMBED_DIM
        # the reference tokenizes with padding='longest' (blip_cir.py:94-98);
        # a fixed length keeps jit shapes static — raise it for caption sets
        # with >text_max_len-2 WordPiece tokens
        self.text_max_len = text_max_len

    # ---- construction ----
    def init_params(self, rng):
        images = jnp.zeros((1, self.input_dim, self.input_dim, 3), self.dtype)
        ids = jnp.zeros((1, self.text_max_len), jnp.int32)
        mask = jnp.ones((1, self.text_max_len), jnp.int32)
        return self.model.init(rng, images, ids, mask, method="init_all")

    def bank_spec(self) -> BankSpec:
        return BankSpec((self.vit_cfg.num_tokens, self.vit_cfg.width),
                        (EMBED_DIM,))

    # ---- encoders ----
    def encode_image(self, params, images):
        return self.model.apply(params, images, method="img_embed")

    def gallery_features(self, params, images):
        tokens = self.encode_image(params, images)
        return self.model.apply(params, tokens, method="img_pooled")

    def bank_features(self, params, images):
        tokens = self.encode_image(params, images)
        pooled = self.model.apply(params, tokens, method="img_pooled")
        return tokens, pooled

    def index_features(self, params, images):
        """Eval (ref blip4cir/utils.py:24-68): raw ViT tokens for the
        cross-attention fusion, pooled+normalized (256-d) for scoring."""
        tokens, pooled = self.bank_features(params, images)
        return {"target": pooled, "refer": tokens}

    def encode_text(self, params, text_ids):
        """Fusion-free text path isn't part of the reference surface; provided
        for completeness: MED self-attention only, CLS -> text_proj."""
        ids, mask = text_ids[:, 0, :], text_ids[:, 1, :]
        return self.model.apply(params, ids, mask, method="text_only")

    # ---- fusion ----
    def fuse(self, params, refer_feats, text_ids, dropout_rng=None):
        ids, mask = text_ids[:, 0, :], text_ids[:, 1, :]
        if dropout_rng is not None and self.med_cfg.dropout_rate:
            return self.model.apply(params, refer_feats, ids, mask,
                                    method="img_txt_fusion",
                                    deterministic=False,
                                    rngs={"dropout": dropout_rng})
        return self.model.apply(params, refer_feats, ids, mask,
                                method="img_txt_fusion")

    # ---- losses ----
    def stage1_loss(self, params, images_refer, images_target, text_ids,
                    dropout_rng=None):
        """End-to-end in-batch InfoNCE (`--wo_bank`). The reference repo
        trains blip4cir stage 2 only (its stage-1 ckpts ship from the
        upstream BLIP4CIR project); this applies clip4cir's stage-1
        objective (clip4cir/models.py:146-161) to the BLIP fusion: query =
        img_txt_fusion(live ViT tokens, text), target = pooled-normalized
        target features. With `dropout_rng`, the MED side runs train-mode
        dropout — torch `train()` semantics with the med_config.json
        hidden_dropout_prob (0.1), the regularization the upstream stage-1
        recipes train under."""
        refer_tokens = self.encode_image(params, images_refer)
        target = self.gallery_features(params, images_target)
        query = self.fuse(params, refer_tokens, text_ids,
                          dropout_rng=dropout_rng)
        return infonce.in_batch_infonce(query, target,
                                        params["params"]["tau"])

    def stage2_loss(self, params, refer_feats, text_ids, target_bank, labels,
                    *, neg_idx: Optional[jnp.ndarray] = None, impl: str = "auto",
                    dropout_rng: Optional[jnp.ndarray] = None):
        query = self.fuse(params, refer_feats, text_ids,
                          dropout_rng=dropout_rng)
        tau = params["params"]["tau"]
        if neg_idx is not None:
            return infonce.sampled_neg_infonce(query, target_bank, labels,
                                               neg_idx, tau)
        return bank_infonce(query, target_bank, labels, tau, impl=impl)

    # ---- host helpers ----
    def tokenize(self, texts):
        """Returns a stacked (B, 2, L) int32 array: [input_ids; attention_mask]
        with the enc-token swap applied (ref blip_cir.py:99-100). Packing both
        into one array keeps the CIRBackbone tokenize->device contract."""
        import numpy as np

        ids, mask = self.tokenizer(texts, max_length=self.text_max_len,
                                   replace_cls_with_enc=True)
        return np.stack([ids, mask], axis=1)

    # ---- trainability ----
    def trainable_filter(self, path) -> bool:
        """init_stage2 freezes the ViT and vision_proj
        (ref blip_cir.py:48-52)."""
        parts = [p for p in path if p != "params"]
        return not (parts and parts[0] in ("visual_encoder", "vision_proj"))


@register_backbone("blip")
def _build_blip(**kw) -> BlipCIR:
    return BlipCIR(**kw)
