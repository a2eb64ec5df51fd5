"""LLaVA-v1 in flax: CLIP ViT-L/14 vision tower + linear projector + LLaMA.

Parity targets (reference file:line):
  * architecture — `zscir/llava/model/llava_arch.py:26-72`: HF
    CLIPVisionModel tower, `mm_projector = nn.Linear(mm_hidden, hidden)`,
    LLaMA language model (`llava_llama.py:34-46`);
  * feature tap — `clip_encoder.py:29-37`: hidden_states[select_layer]
    (default -2, i.e. the penultimate block's output, PRE final LayerNorm)
    with the CLS token dropped ('patch' select);
  * embedding splice — `llava_arch.py:96-200`: the <image> placeholder in
    the token stream is replaced by the projected patch features;
  * captioning contract — `zscir/captioner_llava.py:32-62`: llava_v1
    conversation template, `tokenizer_image_token` with
    IMAGE_TOKEN_INDEX=-200, sampling T=0.01/top_p=0.01, stop on
    `conv.sep2` ("</s>" — LLaMA's EOS).

TPU-native design: the tower runs only the blocks the feature tap needs
(select_layer=-2 => depth-1 blocks; the reference computes all 24 then
indexes hidden_states — we never build the unused last block). The caption
prompt is shared per batch, so the spliced embedding layout is static and
generation is the single KV-cached `lax.scan` of models/llama.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.models.layers import LayerNorm, Transformer, quick_gelu
from spn4cir_tpu.models.llama import (LlamaConfig, LlamaLM, llama_generate)

Dtype = Any

IMAGE_TOKEN_INDEX = -200  # zscir/llava/constants.py:8
DEFAULT_IMAGE_TOKEN = "<image>"

# conv_llava_v1 (zscir/llava/conversation.py:336-347)
LLAVA_V1_SYSTEM = (
    "A chat between a curious human and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the human's questions.")
LLAVA_V1_ROLES = ("USER", "ASSISTANT")
LLAVA_V1_SEP = " "
LLAVA_V1_SEP2 = "</s>"


@dataclasses.dataclass(frozen=True)
class LlavaVisionConfig:
    """HF CLIPVisionModel geometry (clip-vit-large-patch14 defaults)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    select_layer: int = -2  # hidden_states index, HF convention
    select_feature: str = "patch"  # 'patch' drops CLS; 'cls_patch' keeps

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def effective_layers(self) -> int:
        """Blocks actually run: hidden_states[-2] = depth-1 blocks applied."""
        n = self.num_layers + self.select_layer + 1 \
            if self.select_layer < 0 else self.select_layer
        assert 0 < n <= self.num_layers
        return n

    @classmethod
    def tiny(cls, **kw) -> "LlavaVisionConfig":
        base = dict(image_size=28, patch_size=14, width=32, num_layers=3,
                    num_heads=4)
        base.update(kw)
        return cls(**base)


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    llama: LlamaConfig
    vision: LlavaVisionConfig

    @classmethod
    def v1_7b(cls) -> "LlavaConfig":
        return cls(llama=LlamaConfig.llama_7b(), vision=LlavaVisionConfig())

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "LlavaConfig":
        return cls(llama=LlamaConfig.tiny(vocab_size=vocab_size),
                   vision=LlavaVisionConfig.tiny())


class LlavaVisionTower(nn.Module):
    """HF CLIPVisionModel trunk truncated at the feature tap.

    Equivalent math to `CLIPVisionTower.feature_select`
    (clip_encoder.py:29-37): embeddings -> pre-LN -> effective_layers
    pre-LN blocks; NO final post_layernorm (the tap is a raw encoder
    hidden state). QuickGELU — OpenAI-trained CLIP ViTs ship
    hidden_act='quick_gelu'."""

    cfg: LlavaVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        p = cfg.patch_size
        # HF CLIPVisionEmbeddings: bias-free patch conv
        x = nn.Conv(cfg.width, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(images)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(cfg.width ** -0.5),
                         (cfg.width,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.width)), x],
            axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(cfg.width ** -0.5),
                         (cfg.num_patches + 1, cfg.width), jnp.float32)
        x = x + pos.astype(self.dtype)
        x = LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        x = Transformer(cfg.effective_layers, cfg.num_heads, dtype=self.dtype,
                        act=quick_gelu, name="transformer")(x)
        if cfg.select_feature == "patch":
            return x[:, 1:]
        return x


class LlavaModule(nn.Module):
    """vision_tower + mm_projector + language model (llava_arch.py:26-46)."""

    cfg: LlavaConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.vision_tower = LlavaVisionTower(self.cfg.vision, self.dtype)
        self.mm_projector = nn.Dense(self.cfg.llama.hidden_size,
                                     dtype=self.dtype, name="mm_projector")
        self.language_model = LlamaLM(self.cfg.llama, self.dtype)

    def encode_images(self, images):
        """(B, H, W, 3) -> (B, P, llama_hidden) projected patch features
        (llava_arch.py:85-88: tower then linear projector)."""
        return self.mm_projector(self.vision_tower(images))

    def lm_logits(self, inputs_embeds, attention_mask=None):
        return self.language_model(inputs_embeds=inputs_embeds,
                                   attention_mask=attention_mask)

    def __call__(self, images, inputs_embeds):
        """Init/trace path touching every submodule: encode images AND run
        the LM on caller-built embeddings. Production flows call
        encode_images then splice_image_embeds + lm_logits."""
        return self.encode_images(images), self.lm_logits(inputs_embeds)


def tokenizer_image_token(prompt: str, encode: Callable[[str], List[int]],
                          bos_id: Optional[int],
                          image_token_index: int = IMAGE_TOKEN_INDEX
                          ) -> List[int]:
    """`zscir/llava/mm_utils.py:18-37` re-implemented over a generic
    `encode` callable: split the prompt on '<image>', tokenize each chunk,
    and splice `image_token_index` between chunks, dropping each non-first
    chunk's BOS."""
    chunks = [encode(c) for c in prompt.split(DEFAULT_IMAGE_TOKEN)]

    def insert_separator(X, sep):
        return [e for pair in zip(X, [sep] * len(X)) for e in pair][:-1]

    input_ids: List[int] = []
    offset = 0
    if chunks and chunks[0] and bos_id is not None and chunks[0][0] == bos_id:
        offset = 1
        input_ids.append(chunks[0][0])
    for x in insert_separator(chunks, [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])
    return input_ids


def build_llava_v1_prompt(user_message: str) -> str:
    """conv_llava_v1 single-turn prompt (conversation.py:50-60 TWO style):
    system + sep + 'USER: <msg>' + sep + 'ASSISTANT:'. The captioner's
    message is '<image>\\nuser: {prompt}' (captioner_llava.py:35-41)."""
    msg = f"{DEFAULT_IMAGE_TOKEN}\nuser: {user_message}"
    return (LLAVA_V1_SYSTEM + LLAVA_V1_SEP
            + f"{LLAVA_V1_ROLES[0]}: {msg}" + LLAVA_V1_SEP
            + f"{LLAVA_V1_ROLES[1]}:")


def splice_image_embeds(embed_table, ids: Sequence[int],
                        image_features: jnp.ndarray) -> jnp.ndarray:
    """Build (B, P_pre + num_patches + P_post, D) inputs_embeds from a
    shared prompt id list containing exactly one IMAGE_TOKEN_INDEX
    (llava_arch.py:137-143: embeds before, image features, embeds after).
    image_features: (B, num_patches, D). `embed_table` may be dense or the
    int8 QuantKernel of a weight-quantized LM."""
    from spn4cir_tpu.models.llama import _embed_rows

    ids = list(ids)
    img_pos = ids.index(IMAGE_TOKEN_INDEX)
    pre = _embed_rows(embed_table, jnp.asarray(ids[:img_pos], jnp.int32))
    post = _embed_rows(embed_table,
                       jnp.asarray(ids[img_pos + 1:], jnp.int32))
    b = image_features.shape[0]
    pre = jnp.broadcast_to(pre[None], (b,) + pre.shape)
    post = jnp.broadcast_to(post[None], (b,) + post.shape)
    return jnp.concatenate(
        [pre, image_features.astype(pre.dtype), post], axis=1)


class LlavaCaptioner:
    """Batched LLaVA captioning with the reference's exact prompt/sampling
    contract (captioner_llava.py:32-62): llava_v1 template, do_sample with
    temperature=0.01 and top_p=0.01, stop at EOS ('</s>' = conv.sep2), strip
    whitespace. One compiled scan per (batch, prompt_len, max_new) geometry.

    `tokenizer` must expose encode(str)->List[int] (BOS included),
    decode(List[int])->str, bos_token_id, eos_token_id — satisfied by HF
    LLaMA tokenizers and by the test-local tiny tokenizer."""

    def __init__(self, cfg: LlavaConfig, tokenizer, dtype=jnp.float32,
                 mesh=None):
        self.cfg = cfg
        self.tok = tokenizer
        self.module = LlavaModule(cfg, dtype)
        self._jit_cache: Dict[Any, Any] = {}
        self._cache_sharding = None
        # TP params stay on the XLA matmul path (None = auto single-device)
        self._quant_kernel = False if mesh is not None else None
        if mesh is not None:
            # tensor-parallel captioning: params sharded by
            # parallel/tp.py:shard_llava_params; pin the KV cache to the
            # k/v column shards
            from spn4cir_tpu.parallel.tp import llama_cache_sharding
            self._cache_sharding = llama_cache_sharding(cfg.llama, mesh)

    def init_params(self, rng):
        v = self.cfg.vision
        images = jnp.zeros((1, v.image_size, v.image_size, 3))
        embeds = jnp.zeros((1, 4, self.cfg.llama.hidden_size))
        return self.module.init(rng, images, embeds)

    def prompt_ids(self, user_message: str) -> List[int]:
        prompt = build_llava_v1_prompt(user_message)
        return tokenizer_image_token(prompt, self.tok.encode,
                                     getattr(self.tok, "bos_token_id", None))

    def caption(self, params, images, user_message: str, *,
                max_new_tokens: int = 64, temperature: float = 0.01,
                top_p: float = 0.01, rng=None,
                cache_dtype=None, attn_kernel=None) -> List[str]:
        """images: (B, H, W, 3) preprocessed floats -> B caption strings.

        `cache_dtype` defaults to bfloat16 at production LM widths (the KV
        cache, not the weights, bounds batch on a 16 GB chip and its reads
        are pure decode bandwidth) and float32 at test-tiny widths, where
        the HF-parity suites demand bit-level agreement."""
        import jax.numpy as jnp

        if cache_dtype is None:
            cache_dtype = (jnp.bfloat16
                           if self.cfg.llama.hidden_size >= 1024
                           else jnp.float32)
        ids = self.prompt_ids(user_message)
        eos = self.tok.eos_token_id
        key = ("caption", images.shape, tuple(ids), max_new_tokens,
               temperature, top_p, jnp.dtype(cache_dtype).name, attn_kernel)
        if key not in self._jit_cache:
            def run(params, images, rng):
                img_feats = self.module.apply(
                    params, images, method=LlavaModule.encode_images)
                lm_params = params["params"]["language_model"]
                embeds = splice_image_embeds(lm_params["embed_tokens"], ids,
                                             img_feats)
                return llama_generate(
                    lm_params, self.cfg.llama, embeds, eos_id=eos,
                    pad_id=eos, max_new_tokens=max_new_tokens,
                    do_sample=True, temperature=temperature, top_p=top_p,
                    rng=rng, cache_dtype=cache_dtype,
                    cache_sharding=self._cache_sharding,
                    quant_kernel=self._quant_kernel,
                    attn_kernel=attn_kernel)

            self._jit_cache[key] = jax.jit(run)
        out = self._jit_cache[key](
            params, images,
            rng if rng is not None else jax.random.PRNGKey(0))
        out = np.asarray(out)
        captions = []
        for row in out:
            toks = []
            for t in row.tolist():
                if t == eos:
                    break
                toks.append(t)
            text = self.tok.decode(toks)
            captions.append(text.strip().replace(LLAVA_V1_SEP2, ""))
        return captions
