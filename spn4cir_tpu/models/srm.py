"""SRM dual-encoder: Unicom ViT-L/14 images + BGE-base-en texts.

Parity target: `zscir/srm_utils.py:35-69` SRMCMRModel — the secondary
retrieval model that scores candidate (reference, target) image pairs for
the positive-generation pipeline:
  * encode_image: unicom.load('ViT-L/14') -> L2-normalized embedding (:52-57)
  * encode_text: AutoModel('BAAI/bge-base-en') last_hidden_state[:, 0]
    (CLS) -> L2-normalized (:59-68)

Checkpoints are external assets; converters:
`convert.convert_unicom_state_dict` (FP16-ViT-L-14.pt) and
`convert.convert_bge_state_dict` (HF BertModel save)."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.models.med import MedBert, MedConfig
from spn4cir_tpu.models.unicom import UnicomConfig, UnicomViT
from spn4cir_tpu.tokenizer.wordpiece import BertTokenizer, tiny_test_vocab


def _l2(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


class SRMModel:
    """Functional driver: params are {'unicom': ..., 'bge': ...}."""

    def __init__(self, tiny: bool = False,
                 bert_vocab_path: Optional[str] = None,
                 unicom_cfg: Optional[UnicomConfig] = None,
                 bge_cfg: Optional[MedConfig] = None,
                 text_max_len: int = 64):
        if tiny:
            self.tokenizer = BertTokenizer(vocab=tiny_test_vocab(),
                                           add_blip_tokens=False)
            unicom_cfg = unicom_cfg or UnicomConfig.tiny()
            bge_cfg = bge_cfg or MedConfig.tiny(self.tokenizer.vocab_size,
                                                type_vocab_size=2)
        else:
            # BGE uses the plain bert-base-uncased vocab (no BLIP tokens)
            self.tokenizer = BertTokenizer(vocab_path=bert_vocab_path,
                                           add_blip_tokens=False)
            unicom_cfg = unicom_cfg or UnicomConfig.vit_l14()
            bge_cfg = bge_cfg or MedConfig.bge_base(self.tokenizer.vocab_size)
        self.unicom_cfg = unicom_cfg
        self.bge_cfg = bge_cfg
        self.text_max_len = text_max_len
        self.visual = UnicomViT(unicom_cfg)
        self.text = MedBert(bge_cfg)
        self.input_dim = unicom_cfg.input_size
        self.visual_dim = unicom_cfg.embedding_size
        self.text_dim = bge_cfg.hidden_size

    def init_params(self, rng) -> dict:
        r1, r2 = jax.random.split(rng)
        img = jnp.zeros((1, self.input_dim, self.input_dim, 3))
        ids = jnp.zeros((1, self.text_max_len), jnp.int32)
        return {"unicom": self.visual.init(r1, img),
                "bge": self.text.init(r2, ids, jnp.ones_like(ids))}

    def encode_image(self, params, images) -> jnp.ndarray:
        return _l2(self.visual.apply(params["unicom"], images))

    def encode_text_ids(self, params, input_ids, attention_mask) -> jnp.ndarray:
        hidden = self.text.apply(params["bge"], input_ids, attention_mask)
        return _l2(hidden[:, 0].astype(jnp.float32))

    def tokenize(self, texts: List[str]):
        return self.tokenizer(texts, max_length=self.text_max_len)

    def encode_text(self, params, texts: List[str]) -> jnp.ndarray:
        ids, mask = self.tokenize(texts)
        return self.encode_text_ids(params, jnp.asarray(ids), jnp.asarray(mask))

    def load_torch(self, unicom_path: str, bge_path: str) -> dict:
        """Convert the reference's checkpoint pair into SRM params."""
        from spn4cir_tpu.models.convert import (convert_bge_state_dict,
                                                convert_unicom_state_dict,
                                                load_torch_state_dict)
        return {
            "unicom": convert_unicom_state_dict(
                load_torch_state_dict(unicom_path), self.unicom_cfg.depth),
            "bge": convert_bge_state_dict(
                load_torch_state_dict(bge_path), self.bge_cfg.num_layers),
        }
