"""Q-Former (BLIP-2's querying transformer) in flax.

Parity target: `blip24cir/lavis/models/blip2_models/Qformer.py` as built by
`Blip2Base.init_Qformer` (`blip2.py:47-61`): BERT-base (768/12/12, eps 1e-12,
vocab 30522+1) where
  - the input sequence is [32 learned query tokens ; text embeddings], with
    the embeddings LayerNorm applied over the concatenation
    (Qformer.py:78-110);
  - cross-attention to frozen image tokens exists on every 2nd layer
    (cross_attention_freq=2) and attends only from the query positions
    (Qformer.py:434-447);
  - the feed-forward is split: query positions use `intermediate_query` /
    `output_query`, text positions use `intermediate`/`output`
    (Qformer.py:449-467). BLIP-2 initializes the query FFN as a copy of the
    text FFN (`blip2_qformer_cir_align_prompt.py:76-80`); the conversion
    utility replicates that.

TPU-native: with freq=2 fixed, layers scan as (cross-layer, plain-layer)
pairs — one compiled pair body, stacked params, no per-layer Python
branching."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from spn4cir_tpu.models.med import MedConfig, _BertAttention, additive_mask

Dtype = Any
LN_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30523
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 1408  # EVA ViT-g feature width
    num_query_tokens: int = 32
    cross_attention_freq: int = 2
    dropout_rate: float = 0.0  # HF BERT train-mode dropout (0.0 = parity)

    @classmethod
    def tiny(cls, vocab_size: int = 128, **kw) -> "QFormerConfig":
        return cls(vocab_size=vocab_size, hidden_size=32, num_layers=2,
                   num_heads=2, intermediate_size=64, encoder_width=32,
                   num_query_tokens=8, **kw)

    def as_med(self) -> MedConfig:
        return MedConfig(vocab_size=self.vocab_size,
                         hidden_size=self.hidden_size,
                         num_layers=self.num_layers, num_heads=self.num_heads,
                         intermediate_size=self.intermediate_size,
                         encoder_width=self.encoder_width,
                         dropout_rate=self.dropout_rate)


def _ln(name: str):
    return nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class _SplitFFN(nn.Module):
    """Query/text-split feed-forward with post-LN residual.

    The modified LAVIS layer gates the split on the PRESENCE of encoder
    states, not on query_length (ref Qformer.py:434-470, the "baiyang
    change"): with an image present, query positions use the `_query` FFN
    and text positions the plain FFN; without one (the stage-2 text
    re-read), the whole sequence uses the plain FFN."""

    cfg: QFormerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, query_length: int, split: bool,
                 deterministic: bool = True):
        def ffn(x, suffix):
            inter = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype,
                             name=f"intermediate{suffix}")(x)
            inter = jax.nn.gelu(inter, approximate=False)
            out = nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                           name=f"output{suffix}")(inter)
            if self.cfg.dropout_rate:
                out = nn.Dropout(self.cfg.dropout_rate,
                                 name=f"drop{suffix}")(
                    out, deterministic=deterministic)
            return _ln(f"ln{suffix}")((x + out).astype(jnp.float32)).astype(self.dtype)

        if not split:
            # touch the query FFN params so the module structure is stable
            # across modes (flax materializes traced paths only)
            _ = ffn(hidden[:, :1], "_query")
            return ffn(hidden, "")
        q_out = ffn(hidden[:, :query_length], "_query")
        if hidden.shape[1] > query_length:
            t_out = ffn(hidden[:, query_length:], "")
            return jnp.concatenate([q_out, t_out], axis=1)
        return q_out


class _QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_states, self_mask, cross_mask, query_length,
                 split: bool, deterministic: bool = True):
        med = self.cfg.as_med()
        hidden = _BertAttention(med, self.dtype, name="self_attn")(
            hidden, mask=self_mask, deterministic=deterministic)
        if self.has_cross and enc_states is not None:
            q_part = _BertAttention(med, self.dtype, name="cross_attn")(
                hidden[:, :query_length], kv=enc_states, mask=cross_mask,
                deterministic=deterministic)
            hidden = jnp.concatenate([q_part, hidden[:, query_length:]], axis=1)
        return _SplitFFN(self.cfg, self.dtype, name="ffn")(
            hidden, query_length, split, deterministic)


class _LayerPair(nn.Module):
    """(cross layer, plain layer) pair for nn.scan (freq=2)."""

    cfg: QFormerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_states, self_mask, cross_mask, query_length,
                 deterministic):
        # the FFN split applies to EVERY layer whenever an image is present
        # (ref Qformer.py:435 gates on encoder_hidden_states, not has_cross)
        split = enc_states is not None
        hidden = _QFormerLayer(self.cfg, True, self.dtype, name="cross_layer")(
            hidden, enc_states, self_mask, cross_mask, query_length, split,
            deterministic)
        hidden = _QFormerLayer(self.cfg, False, self.dtype, name="plain_layer")(
            hidden, None, self_mask, None, query_length, split, deterministic)
        return hidden, None


class QFormer(nn.Module):
    """Qformer.bert equivalent. Modes (all used by the CIR model):
      - query-only image encode: (query_embeds, encoder_hidden_states)
      - fusion: (input_ids, query_embeds, attention_mask, encoder_*)
      - text re-read: (input_ids, query_embeds=cached states, attention_mask)
    """

    cfg: QFormerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids=None, query_embeds=None, attention_mask=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        assert cfg.cross_attention_freq == 2 and cfg.num_layers % 2 == 0
        assert query_embeds is not None
        query_length = query_embeds.shape[1]

        parts = [query_embeds.astype(jnp.float32)]
        if input_ids is not None:
            word = self.param("word_embeddings", nn.initializers.normal(0.02),
                              (cfg.vocab_size, cfg.hidden_size), jnp.float32)
            pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                             (cfg.max_position_embeddings, cfg.hidden_size),
                             jnp.float32)
            parts.append(word[input_ids] + pos[: input_ids.shape[1]][None])
        x = jnp.concatenate(parts, axis=1)
        # LN over the concatenation, queries included (ref Qformer.py:105-108)
        x = _ln("embeddings_ln")(x).astype(self.dtype)
        if cfg.dropout_rate:
            x = nn.Dropout(cfg.dropout_rate, name="emb_drop")(
                x, deterministic=deterministic)

        if attention_mask is not None:
            self_mask = additive_mask(attention_mask)
        else:
            self_mask = None
        cross_mask = (additive_mask(encoder_attention_mask)
                      if encoder_attention_mask is not None else None)
        if encoder_hidden_states is not None:
            encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        scanned = nn.scan(
            _LayerPair,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers // 2,
            in_axes=(nn.broadcast,) * 5,
        )(cfg=cfg, dtype=self.dtype, name="pairs")
        x, _ = scanned(x, encoder_hidden_states, self_mask, cross_mask,
                       query_length, deterministic)
        return x
