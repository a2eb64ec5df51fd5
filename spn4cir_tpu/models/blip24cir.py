"""blip24cir backbone: frozen EVA-ViT-g + Q-Former with aligned prompts
(the SPRC model SPN fine-tunes).

Parity targets:
  - `Blip2QformerCirAlignPrompt`
    (`blip24cir/lavis/models/blip2_models/blip2_qformer_cir_align_prompt.py`):
    frozen EVA-CLIP-g ViT + external ln_vision (`blip2.py:63`), 32 query
    tokens, vision_proj/text_proj 768->256, learned prompt_tokens;
    `init_stage2` deep-copies Qformer->Qformer_query + text_proj->text_proj_q
    and freezes everything else (`:96-108`);
  - bank forms (`get_bank_feats` `:110-176`): refer bank = fusion hidden
    states (32, 768); target bank = per-image 32-query features (32, 256);
  - stage-2 loss (`forward_stage2` `:226-268`): re-run Qformer_query on
    (text, cached fusion states), CLS = token index 32 (first text position),
    per-target max over 32 queries, CE / temp — the per-sample Python loop
    becomes one einsum (`spn4cir_tpu.ops.infonce.max_query_infonce`);
  - `inference` (`:270-319`) and `extract_target_features` (`:321-343`).

TPU-native: all passes are jitted; the EVA tower reuses the shared
scan-rolled Transformer (mlp_ratio 4.3637, eps 1e-6); the frozen ViT runs in
bf16 (the reference uses fp16 ViT, `blip2_pretrain.yaml`)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spn4cir_tpu.models.api import BankSpec, CIRBackbone, register_backbone
from spn4cir_tpu.models.layers import LayerNorm, Transformer
from spn4cir_tpu.models.qformer import QFormer, QFormerConfig
from spn4cir_tpu.ops import infonce
from spn4cir_tpu.tokenizer.wordpiece import BertTokenizer, tiny_test_vocab

EMBED_DIM = 256
MAX_TXT_LEN = 32


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


@dataclasses.dataclass(frozen=True)
class EvaViTConfig:
    """EVA-CLIP-g geometry (ref blip24cir/lavis/models/eva_vit.py:428:
    create_eva_vit_g — 224px/14, width 1408, depth 39, heads 16,
    mlp_ratio 4.3637)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    layers: int = 39
    heads: int = 16
    mlp_ratio: float = 4.3637

    @classmethod
    def tiny(cls) -> "EvaViTConfig":
        return cls(image_size=28, patch_size=14, width=32, layers=2, heads=2,
                   mlp_ratio=4.0)

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


class EvaViT(nn.Module):
    """EVA ViT-g feature tower (no final LN — BLIP-2 applies an external
    ln_vision, ref blip2.py:63)."""

    cfg: EvaViTConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed")(images)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.width)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, cfg.width), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.width)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (cfg.num_tokens, cfg.width), jnp.float32)
        x = x + pos.astype(self.dtype)[None]
        return Transformer(cfg.layers, cfg.heads, dtype=self.dtype, act=_gelu,
                           mlp_mult=cfg.mlp_ratio, ln_eps=1e-6,
                           remat=self.remat, name="blocks")(x)


class Blip2CirModule(nn.Module):
    vit_cfg: EvaViTConfig
    q_cfg: QFormerConfig
    embed_dim: int = EMBED_DIM
    tau_init: float = 0.05
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.visual_encoder = EvaViT(self.vit_cfg, self.dtype, self.remat)
        self.ln_vision = LayerNorm(epsilon=1e-12, dtype=self.dtype)
        self.qformer = QFormer(self.q_cfg, self.dtype)         # frozen in stage 2
        self.qformer_query = QFormer(self.q_cfg, self.dtype)   # trainable copy
        self.vision_proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.text_proj = nn.Dense(self.embed_dim, dtype=self.dtype)      # frozen
        self.text_proj_q = nn.Dense(self.embed_dim, dtype=self.dtype)    # trainable
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, self.q_cfg.num_query_tokens, self.q_cfg.hidden_size))
        self.prompt_tokens = self.param(
            "prompt_tokens", nn.initializers.normal(0.02),
            (1, self.q_cfg.num_query_tokens, self.q_cfg.hidden_size))
        self.tau = self.param("tau", nn.initializers.constant(self.tau_init), ())

    # ---- frozen image path ----
    def image_embeds(self, images):
        """ln_vision(EVA(images)) -> (B, 257, 1408) frozen features."""
        return self.ln_vision(self.visual_encoder(images))

    def target_query_feats(self, image_embeds):
        """Query-only Q-Former read of an image -> normalized (B, 32, 256)
        (ref :152-166 / extract_target_features :321-343)."""
        b = image_embeds.shape[0]
        queries = jnp.broadcast_to(
            self.query_tokens, (b, *self.query_tokens.shape[1:]))
        img_mask = jnp.ones(image_embeds.shape[:-1], jnp.int32)
        hidden = self.qformer(query_embeds=queries,
                              encoder_hidden_states=image_embeds,
                              encoder_attention_mask=img_mask)
        return infonce.l2_normalize(self.vision_proj(hidden).astype(jnp.float32))

    def fusion_hidden(self, image_embeds, input_ids, attention_mask):
        """Multimodal fusion pass: text+queries cross-attending to the
        reference image; returns the 32 fused query states (B, 32, 768)
        (ref get_bank_feats :131-146)."""
        b = image_embeds.shape[0]
        queries = jnp.broadcast_to(
            self.query_tokens, (b, *self.query_tokens.shape[1:]))
        img_mask = jnp.ones(image_embeds.shape[:-1], jnp.int32)
        full_mask = jnp.concatenate(
            [jnp.ones((b, queries.shape[1]), jnp.int32), attention_mask], axis=1)
        hidden = self.qformer(input_ids=input_ids, query_embeds=queries,
                              attention_mask=full_mask,
                              encoder_hidden_states=image_embeds,
                              encoder_attention_mask=img_mask)
        return hidden[:, : queries.shape[1], :]

    # ---- trainable stage-2 path ----
    def fusion_feats_q(self, fusion_hidden_states, input_ids, attention_mask,
                       deterministic: bool = True):
        """Stage-2 text re-read with the trainable Q-Former copy: token at
        index num_query (first text position, the CLS) -> text_proj_q ->
        normalize (ref forward_stage2 :244-253). deterministic=False enables
        Q-Former dropout (the reference trains this module in train mode)."""
        b = fusion_hidden_states.shape[0]
        nq = fusion_hidden_states.shape[1]
        full_mask = jnp.concatenate(
            [jnp.ones((b, nq), jnp.int32), attention_mask], axis=1)
        hidden = self.qformer_query(
            input_ids=input_ids, query_embeds=fusion_hidden_states,
            attention_mask=full_mask, deterministic=deterministic)
        return infonce.l2_normalize(
            self.text_proj_q(hidden[:, nq, :]).astype(jnp.float32))

    def inference_feats(self, image_embeds, input_ids, attention_mask):
        """Eval path (ref inference :270-319): frozen fusion pass, then the
        trainable re-read (query_type=1)."""
        fused = self.fusion_hidden(image_embeds, input_ids, attention_mask)
        return self.fusion_feats_q(fused, input_ids, attention_mask)

    def __call__(self, images, input_ids, attention_mask):
        embeds = self.image_embeds(images)
        tq = self.target_query_feats(embeds)
        fused = self.fusion_hidden(embeds, input_ids, attention_mask)
        feats = self.fusion_feats_q(fused, input_ids, attention_mask)
        # touch remaining params at init: frozen text_proj + prompt tokens
        _ = self.text_proj(fused[:, 0, :])
        _ = self.prompt_tokens
        return tq, feats, self.tau


class Blip2CIR(CIRBackbone):
    name = "blip2"
    # the published FIQ eval ranks the FULL gallery for this backbone
    # (no reference-image filter, ref blip24cir/validate.py:29-43)
    fiq_exclude_reference = False
    extend_suffix = "blip2"
    default_transform = "targetpad"

    def __init__(self, blip2_size: str = "pretrain", tau: float = 0.05,
                 dtype=jnp.float32, remat: bool = False,
                 bert_vocab_path: Optional[str] = None,
                 vit_cfg: Optional[EvaViTConfig] = None,
                 q_cfg: Optional[QFormerConfig] = None,
                 dropout: float = 0.0, **_):
        if blip2_size == "test-tiny":
            self.tokenizer = BertTokenizer(vocab=tiny_test_vocab())
            vit_cfg = vit_cfg or EvaViTConfig.tiny()
            q_cfg = q_cfg or QFormerConfig.tiny(self.tokenizer.vocab_size)
        else:
            self.tokenizer = BertTokenizer(vocab_path=bert_vocab_path)
            vit_cfg = vit_cfg or EvaViTConfig()
            q_cfg = q_cfg or QFormerConfig(vocab_size=self.tokenizer.vocab_size,
                                           encoder_width=vit_cfg.width)
        if dropout:
            import dataclasses as _dc
            q_cfg = _dc.replace(q_cfg, dropout_rate=dropout)
        self.vit_cfg = vit_cfg
        self.q_cfg = q_cfg
        self.tau = tau
        self.dtype = dtype
        self.model = Blip2CirModule(vit_cfg, q_cfg, EMBED_DIM, tau,
                                    dtype=dtype, remat=remat)
        self.input_dim = vit_cfg.image_size
        self.embed_dim = EMBED_DIM

    # ---- construction ----
    def init_params(self, rng):
        images = jnp.zeros((1, self.input_dim, self.input_dim, 3), self.dtype)
        ids = jnp.zeros((1, MAX_TXT_LEN), jnp.int32)
        mask = jnp.ones((1, MAX_TXT_LEN), jnp.int32)
        return self.model.init(rng, images, ids, mask)

    def bank_spec(self) -> BankSpec:
        nq = self.q_cfg.num_query_tokens
        return BankSpec((nq, self.q_cfg.hidden_size), (nq, EMBED_DIM))

    # ---- encoders ----
    def encode_image(self, params, images):
        """Frozen ViT embeds (B, 257, 1408) — the eval-side refer form."""
        return self.model.apply(params, images, method="image_embeds")

    def gallery_features(self, params, images):
        embeds = self.encode_image(params, images)
        return self.model.apply(params, embeds, method="target_query_feats")

    def index_features(self, params, images):
        """Eval (ref blip24cir/utils.py:24-68): target = (32, 256) query
        feats for max-sim scoring; refer = frozen ViT embeds for fusion."""
        embeds = self.encode_image(params, images)
        target = self.model.apply(params, embeds, method="target_query_feats")
        return {"target": target, "refer": embeds}

    def encode_text(self, params, text_ids):
        raise NotImplementedError("blip2 has no fusion-free text path")

    # ---- fusion (eval path: refer = frozen ViT embeds) ----
    def fuse(self, params, refer_feats, text_ids):
        ids, mask = text_ids[:, 0, :], text_ids[:, 1, :]
        return self.model.apply(params, refer_feats, ids, mask,
                                method="inference_feats")

    def score_queries(self, query_feats, gallery):
        """Max-over-32-queries similarity (ref inference :313-319)."""
        return infonce.max_query_scores(query_feats, gallery)

    # ---- bank extraction ----
    def bank_features(self, params, images):
        raise NotImplementedError(
            "blip2 refer-bank entries depend on (image, caption); use "
            "bank_features_fused via the caption-aware extraction path")

    def fusion_bank_features(self, params, images, text_ids):
        """(fusion hidden states (B, 32, 768), target query feats (B, 32, 256))
        — the blip2 bank forms (ref get_bank_feats)."""
        ids, mask = text_ids[:, 0, :], text_ids[:, 1, :]
        embeds = self.encode_image(params, images)
        fused = self.model.apply(params, embeds, ids, mask,
                                 method="fusion_hidden")
        target = self.model.apply(params, embeds, method="target_query_feats")
        return fused, target

    # ---- losses ----
    def stage2_query_feats(self, params, refer_feats, text_ids,
                           dropout_rng: Optional[jnp.ndarray] = None):
        """The TRAINING fusion path (`forward_stage2`'s Qformer_query text
        re-read over cached fusion hidden states) — distinct from `fuse`,
        which is the inference path. Factored out so the sharded trainer
        (parallel/train.py) can pair it with the bank-sharded loss."""
        ids, mask = text_ids[:, 0, :], text_ids[:, 1, :]
        if dropout_rng is not None and self.q_cfg.dropout_rate:
            return self.model.apply(params, refer_feats, ids, mask,
                                    method="fusion_feats_q",
                                    deterministic=False,
                                    rngs={"dropout": dropout_rng})
        return self.model.apply(params, refer_feats, ids, mask,
                                method="fusion_feats_q")

    def stage2_loss(self, params, refer_feats, text_ids, target_bank, labels,
                    *, neg_idx: Optional[jnp.ndarray] = None, impl: str = "auto",
                    dropout_rng: Optional[jnp.ndarray] = None):
        """refer_feats here are cached fusion hidden states (B, 32, 768);
        target_bank is (M, 32, 256). Loss = max-over-query InfoNCE
        (ref forward_stage2 :254-266, loop -> einsum)."""
        feats = self.stage2_query_feats(params, refer_feats, text_ids,
                                        dropout_rng)
        tau = params["params"]["tau"]
        if neg_idx is not None:
            negs = jnp.take(target_bank, neg_idx.reshape(-1), axis=0).reshape(
                (*neg_idx.shape, *target_bank.shape[1:]))
            pos = jnp.take(target_bank, labels, axis=0)
            cands = jnp.concatenate([pos[:, None], negs], axis=1)  # (B,1+N,32,256)
            sims = jnp.einsum("bd,bnqd->bnq", feats, cands,
                              preferred_element_type=jnp.float32)
            logits = jnp.max(sims, axis=-1) / tau
            return infonce.cross_entropy(
                logits, jnp.zeros((feats.shape[0],), jnp.int32))
        from spn4cir_tpu.ops.maxquery_kernels import max_query_infonce

        return max_query_infonce(feats, target_bank, labels, tau, impl=impl)

    # ---- host helpers ----
    @staticmethod
    def pre_caption(caption: str, max_words: int = 50) -> str:
        """LAVIS blip_caption eval processor (ref
        blip24cir/lavis/processors/blip_processors.py pre_caption): captions
        pass through this before tokenizing (blip24cir/models.py:62,103,118)."""
        import re

        caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
        caption = re.sub(r"\s{2,}", " ", caption).rstrip("\n").strip(" ")
        words = caption.split(" ")
        if len(words) > max_words:
            caption = " ".join(words[:max_words])
        return caption

    def tokenize(self, texts):
        import numpy as np

        texts = [self.pre_caption(t) for t in texts]
        ids, mask = self.tokenizer(texts, max_length=MAX_TXT_LEN)
        return np.stack([ids, mask], axis=1)

    # ---- optimization ----
    def optimizer_kwargs(self):
        """blip24cir trains with betas (0.9, 0.98), wd 0.05
        (ref blip24cir/train.py optimizer, SURVEY.md §2.1)."""
        return {"b1": 0.9, "b2": 0.98, "eps": 1e-7, "weight_decay": 0.05}

    # ---- trainability ----
    def trainable_filter(self, path) -> bool:
        """init_stage2: only Qformer_query, text_proj_q, and the temperature
        train (ref :96-108)."""
        parts = [p for p in path if p != "params"]
        return bool(parts) and parts[0] in ("qformer_query", "text_proj_q", "tau")

    @staticmethod
    def init_stage2(params):
        """Stage-2 surgery: qformer_query <- qformer, text_proj_q <- text_proj
        (ref :96-108; the reference loads the ckpt twice for this,
        quirk SURVEY.md §8.11 — here it is one functional copy)."""
        p = dict(params)
        inner = dict(p["params"])
        copied = jax.tree_util.tree_map(jnp.array, dict(inner["qformer"]))
        # the trainable copy never cross-attends (text re-read only); its
        # cross-attn params are not materialized in the module
        copied["pairs"] = dict(copied["pairs"])
        copied["pairs"]["cross_layer"] = {
            k: v for k, v in copied["pairs"]["cross_layer"].items()
            if k != "cross_attn"}
        inner["qformer_query"] = copied
        inner["text_proj_q"] = jax.tree_util.tree_map(
            jnp.array, inner["text_proj"])
        p["params"] = inner
        return p


@register_backbone("blip2")
def _build_blip2(**kw) -> Blip2CIR:
    return Blip2CIR(**kw)
