"""MED: BERT mixture encoder with per-layer cross-attention, in flax.

Parity target: the reference's `blip4cir/med.py` BertModel (a modified HF
BERT) as configured by `blip4cir/configs/med_config.json`: hidden 768, 12
layers, 12 heads, intermediate 3072, exact GELU, post-LN with eps 1e-12,
cross-attention to image tokens in every layer (`add_cross_attention: true`),
vocab 30522 + 2 BLIP special tokens.

TPU-native: layers are nn.scan-rolled (stacked params under 'layers'); the
attention mask is an additive f32 bias. Dropout defaults OFF
(dropout_rate=0.0 — exact eval parity); setting dropout_rate=0.1 with
deterministic=False reproduces the reference's train-mode regularization
(HF hidden/attention dropout at the BertSelfAttention/BertSelfOutput/
BertOutput/embeddings positions)."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any
LN_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class MedConfig:
    vocab_size: int = 30524
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 768  # cross-attn kv width (= ViT width)
    # 0 = MED semantics (BLIP's BertEmbeddings has no token_type table);
    # 2 = standard HF BERT (the BGE text encoder, zscir/srm_utils.py:44-46)
    type_vocab_size: int = 0
    # HF BERT trains with hidden/attention dropout 0.1 (med_config.json);
    # the reference's stage-2 runs the live MED side in train mode, so
    # dropout is active there. 0.0 reproduces eval/parity numerics.
    dropout_rate: float = 0.0

    @classmethod
    def tiny(cls, vocab_size: int = 128, **kw) -> "MedConfig":
        return cls(vocab_size=vocab_size, hidden_size=32, num_layers=2,
                   num_heads=2, intermediate_size=64, encoder_width=32, **kw)

    @classmethod
    def bge_base(cls, vocab_size: int = 30522) -> "MedConfig":
        """BAAI/bge-base-en geometry (a standard bert-base-uncased)."""
        return cls(vocab_size=vocab_size, type_vocab_size=2)


def _ln(name: str):
    return nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class _BertAttention(nn.Module):
    cfg: MedConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv=None, mask=None, deterministic: bool = True):
        cfg = self.cfg
        d = cfg.hidden_size
        h = cfg.num_heads
        hd = d // h
        kv_in = hidden if kv is None else kv
        q = nn.Dense(d, dtype=self.dtype, name="query")(hidden)
        k = nn.Dense(d, dtype=self.dtype, name="key")(kv_in)
        v = nn.Dense(d, dtype=self.dtype, name="value")(kv_in)

        def split(t):
            return t.reshape(*t.shape[:-1], h, hd)

        q, k, v = map(split, (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if mask is not None:
            logits = logits + mask
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if cfg.dropout_rate:
            # HF BertSelfAttention drops attention probs
            weights = nn.Dropout(cfg.dropout_rate, name="attn_drop")(
                weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(*hidden.shape[:-1], d)
        out = nn.Dense(d, dtype=self.dtype, name="output")(out)
        if cfg.dropout_rate:
            # HF BertSelfOutput drops the projection before the residual
            out = nn.Dropout(cfg.dropout_rate, name="out_drop")(
                out, deterministic=deterministic)
        return _ln("ln")((hidden + out).astype(jnp.float32)).astype(self.dtype)


class _BertLayer(nn.Module):
    cfg: MedConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_states=None, self_mask=None, cross_mask=None,
                 deterministic: bool = True):
        hidden = _BertAttention(self.cfg, self.dtype, name="self_attn")(
            hidden, mask=self_mask, deterministic=deterministic)
        if enc_states is not None:
            hidden = _BertAttention(self.cfg, self.dtype, name="cross_attn")(
                hidden, kv=enc_states, mask=cross_mask,
                deterministic=deterministic)
        inter = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate")(hidden)
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        if self.cfg.dropout_rate:
            out = nn.Dropout(self.cfg.dropout_rate, name="ffn_drop")(
                out, deterministic=deterministic)
        return _ln("ln")((hidden + out).astype(jnp.float32)).astype(self.dtype)


class _ScanLayer(nn.Module):
    cfg: MedConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_states, self_mask, cross_mask,
                 deterministic):
        y = _BertLayer(self.cfg, self.dtype, name="layer")(
            hidden, enc_states, self_mask, cross_mask, deterministic)
        return y, None


def additive_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) {0,1} -> (B, 1, 1, L) additive f32 bias."""
    return (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9


def causal_additive_mask(length: int) -> jnp.ndarray:
    """(1, 1, L, L) additive causal bias (upper triangle masked), matching the
    HF decoder extended-attention-mask semantics the reference's
    BertLMHeadModel relies on (blip4cir/med.py, is_decoder=True)."""
    tri = jnp.tril(jnp.ones((length, length), jnp.float32))
    return (1.0 - tri)[None, None] * -1e9


class MedBert(nn.Module):
    """BertModel(add_pooling_layer=False) equivalent: token ids (+ mask,
    + optional encoder states for cross-attn) -> last hidden states.
    `causal=True` gives the decoder mode (BertLMHeadModel's bert trunk)."""

    cfg: MedConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, encoder_hidden_states=None,
                 encoder_attention_mask=None, causal: bool = False,
                 deterministic: bool = True):
        cfg = self.cfg
        # MED embeddings: word + position only (the reference's BertEmbeddings
        # drops token_type, blip4cir/med.py)
        emb = self.param("word_embeddings", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        x = emb[input_ids] + pos[: input_ids.shape[1]][None]
        if cfg.type_vocab_size:
            # standard-BERT token_type embeddings; single-sentence inputs use
            # type 0 everywhere (HF default when token_type_ids is omitted)
            tte = self.param("token_type_embeddings",
                             nn.initializers.normal(0.02),
                             (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
            x = x + tte[0]
        x = _ln("embeddings_ln")(x).astype(self.dtype)
        if cfg.dropout_rate:
            x = nn.Dropout(cfg.dropout_rate, name="emb_drop")(
                x, deterministic=deterministic)

        self_mask = additive_mask(attention_mask) if attention_mask is not None else None
        if causal:
            cmask = causal_additive_mask(input_ids.shape[1])
            self_mask = cmask if self_mask is None else self_mask + cmask
        cross_mask = (additive_mask(encoder_attention_mask)
                      if encoder_attention_mask is not None else None)

        scanned = nn.scan(
            _ScanLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        )(cfg=cfg, dtype=self.dtype, name="layers")
        x, _ = scanned(x, encoder_hidden_states, self_mask, cross_mask,
                       deterministic)
        return x


class MedLMHead(nn.Module):
    """BertLMPredictionHead equivalent (ref blip4cir/med.py:520-553):
    dense -> exact GELU -> LayerNorm -> vocab projection (+ bias)."""

    cfg: MedConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        d = self.cfg.hidden_size
        h = nn.Dense(d, dtype=self.dtype, name="transform")(hidden)
        h = jax.nn.gelu(h, approximate=False)
        h = _ln("transform_ln")(h).astype(self.dtype)
        logits = nn.Dense(self.cfg.vocab_size, use_bias=True, dtype=self.dtype,
                          name="decoder")(h)
        return logits


class MedLMModel(nn.Module):
    """BertLMHeadModel equivalent: causal MED trunk + LM head -> logits.
    The reference uses it both for teacher-forced LM loss and as the
    generation backbone (blip4cir/med.py BertLMHeadModel; LAVIS
    XBertLMHeadDecoder)."""

    cfg: MedConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, encoder_hidden_states=None,
                 encoder_attention_mask=None):
        hidden = MedBert(self.cfg, self.dtype, name="bert")(
            input_ids, attention_mask, encoder_hidden_states,
            encoder_attention_mask, causal=True)
        return MedLMHead(self.cfg, self.dtype, name="lm_head")(hidden)
