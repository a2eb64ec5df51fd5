"""BLIP captioner: ViT encoder + MED LM decoder with prompted generation.

Parity target: LAVIS `BlipCaption` ("blip_caption"/base_coco — the model the
reference's captioning stage loads, zscir/captioner_blip.py:35-37) —
`lavis/models/blip_models/blip_caption.py:40-205`:
  * prompt "a picture of " tokenized, CLS swapped for BOS ([DEC]), final SEP
    dropped (blip_caption.py:183-186);
  * generation via the MED BertLMHeadModel cross-attending to the raw ViT
    tokens (med.py:1324-1376): beam search num_beams=3 by default, or
    nucleus sampling top_p=0.9 / repetition_penalty=1.1; max_length=30,
    min_length=10, SEP is EOS;
  * decode skip-special-tokens, then strip the prompt by character count
    (blip_caption.py:202-205).

TPU-native: the encoder runs once per batch; generation is a single compiled
KV-cached `lax.scan` (spn4cir_tpu.models.generation). Static (batch,
max_length) geometry — callers should batch images to a fixed size.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.models.blip_vit import BlipViT, BlipViTConfig
from spn4cir_tpu.models.generation import beam_generate, generate
from spn4cir_tpu.models.med import MedConfig, MedLMModel
from spn4cir_tpu.tokenizer.wordpiece import BertTokenizer, tiny_test_vocab

CAPTION_PROMPT = "a picture of "  # blip_caption_base_coco.yaml "prompt"


class BlipCaptionModule(nn.Module):
    """visual_encoder + text_decoder, the LAVIS BlipCaption param schema."""

    vit_cfg: BlipViTConfig
    med_cfg: MedConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.visual_encoder = BlipViT(self.vit_cfg, self.dtype)
        self.text_decoder = MedLMModel(self.med_cfg, self.dtype)

    def img_embed(self, images):
        return self.visual_encoder(images)

    def lm_logits(self, input_ids, attention_mask, image_embeds):
        """Teacher-forced LM logits (the reference's forward_decoder path,
        blip_caption.py:58-90) — used for LM-loss finetuning and tests."""
        enc_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        return self.text_decoder(input_ids, attention_mask, image_embeds,
                                 enc_mask)

    def __call__(self, images, input_ids, attention_mask):
        return self.lm_logits(input_ids, attention_mask,
                              self.img_embed(images))


class BlipCaptioner:
    """Driver mirroring BlipCaption.generate. `caption(params, images)`
    returns prompt-stripped caption strings."""

    def __init__(self, blip_size: str = "base",
                 bert_vocab_path: Optional[str] = None,
                 med_cfg: Optional[MedConfig] = None,
                 vit_cfg: Optional[BlipViTConfig] = None,
                 prompt: str = CAPTION_PROMPT, dtype=jnp.float32):
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
        self.vit_cfg = vit_cfg
        self.med_cfg = med_cfg
        self.prompt = prompt
        self.model = BlipCaptionModule(vit_cfg, med_cfg, dtype)
        self.input_dim = vit_cfg.image_size

    def init_params(self, rng):
        images = jnp.zeros((1, self.input_dim, self.input_dim, 3), jnp.float32)
        ids = jnp.zeros((1, 8), jnp.int32)
        return self.model.init(rng, images, ids, jnp.ones((1, 8), jnp.int32))

    def prompt_ids(self, batch: int) -> np.ndarray:
        """Tokenized prompt with BOS swap and SEP dropped
        (blip_caption.py:184-186)."""
        ids = [self.tokenizer.dec_token_id] + self.tokenizer.encode(self.prompt)
        return np.tile(np.asarray(ids, np.int32)[None], (batch, 1))

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=(
        "use_nucleus_sampling", "num_beams", "max_length", "min_length",
        "top_p", "repetition_penalty"))
    def _generate_ids(self, params, image_embeds, prompt_ids, rng, *,
                      use_nucleus_sampling=False, num_beams=3, max_length=30,
                      min_length=10, top_p=0.9, repetition_penalty=1.0):
        dec = {"params": params["params"]["text_decoder"]}
        if use_nucleus_sampling:
            # ref med.py:1352-1363: sampling forces repetition_penalty=1.1
            return generate(dec["params"], self.med_cfg, image_embeds,
                            prompt_ids, eos_id=self.tokenizer.sep_id,
                            pad_id=self.tokenizer.pad_id,
                            max_length=max_length, min_length=min_length,
                            do_sample=True, top_p=top_p,
                            repetition_penalty=1.1, rng=rng)
        if num_beams == 1:
            return generate(dec["params"], self.med_cfg, image_embeds,
                            prompt_ids, eos_id=self.tokenizer.sep_id,
                            pad_id=self.tokenizer.pad_id,
                            max_length=max_length, min_length=min_length,
                            repetition_penalty=repetition_penalty)
        return beam_generate(dec["params"], self.med_cfg, image_embeds,
                             prompt_ids, num_beams=num_beams,
                             eos_id=self.tokenizer.sep_id,
                             pad_id=self.tokenizer.pad_id,
                             max_length=max_length, min_length=min_length,
                             repetition_penalty=repetition_penalty)

    def encode(self, params, images) -> jnp.ndarray:
        return self.model.apply(params, jnp.asarray(images),
                                method="img_embed")

    def caption(self, params, images, *, use_nucleus_sampling: bool = False,
                num_beams: int = 3, max_length: int = 30, min_length: int = 10,
                top_p: float = 0.9, repetition_penalty: float = 1.0,
                rng: Optional[jax.Array] = None) -> List[str]:
        """images: (B, H, W, 3) preprocessed. Returns B caption strings with
        the prompt stripped by character count (blip_caption.py:202-205)."""
        embeds = self.encode(params, images)
        prompt_ids = jnp.asarray(self.prompt_ids(embeds.shape[0]))
        ids = self._generate_ids(
            params, embeds, prompt_ids,
            rng if rng is not None else jax.random.PRNGKey(0),
            use_nucleus_sampling=use_nucleus_sampling, num_beams=num_beams,
            max_length=max_length, min_length=min_length, top_p=top_p,
            repetition_penalty=repetition_penalty)
        texts = self.tokenizer.batch_decode(np.asarray(ids))
        return [t[len(self.prompt):] for t in texts]
