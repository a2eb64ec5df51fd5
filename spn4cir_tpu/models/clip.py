"""CLIP in flax: ViT + ModifiedResNet image towers and the text transformer.

Architecture parity targets (checkpoint-convertible via
`spn4cir_tpu.models.convert`): the vendored OpenAI CLIP in the reference —
`VisionTransformer` (`clip4cir/clip/model.py:206-242`), `ModifiedResNet` with
`AttentionPool2d` (`:94-154,58-91`), text transformer with causal mask + EOT
pooling (`:245-374`), QuickGELU (`:166-168`), fp32-upcast LayerNorm
(`:157-163`).

TPU-native departures: bf16 activations with f32 params/LayerNorm instead of
fp16 weight casting; nn.scan-rolled transformer stacks; the attention-pool's
`F.multi_head_attention_forward` call becomes a plain einsum attention that
XLA fuses (SURVEY.md §2.9).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spn4cir_tpu.models.layers import LayerNorm, Transformer

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    # vision
    image_resolution: int
    vision_layers: Any  # int (ViT) or tuple of 4 ints (ResNet)
    vision_width: int
    vision_patch_size: Optional[int]  # None => ModifiedResNet
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_vit(self) -> bool:
        return self.vision_patch_size is not None

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64 if self.is_vit else self.vision_width * 32 // 64


CLIP_CONFIGS = {
    "ViT-B/32": CLIPConfig(512, 224, 12, 768, 32),
    "ViT-B/16": CLIPConfig(512, 224, 12, 768, 16),
    "ViT-L/14": CLIPConfig(
        768, 224, 24, 1024, 14,
        transformer_width=768, transformer_heads=12, transformer_layers=12,
    ),
    "RN50x4": CLIPConfig(
        640, 288, (4, 6, 10, 6), 80, None,
        transformer_width=640, transformer_heads=10, transformer_layers=12,
    ),
    # tiny config for tests (not a released CLIP size)
    "test-tiny": CLIPConfig(
        32, 32, 2, 64, 16, context_length=77,
        transformer_width=32, transformer_heads=2, transformer_layers=2,
    ),
    # tiny tgcir-parity config: the reference TG-CIR hardcodes the ViT-B/16
    # shape contract (fc 768->512, 512-d tokens, tgcir/models.py:61-62) so
    # its oracle needs these widths even at 2 layers
    "test-tgcir": CLIPConfig(
        512, 32, 2, 768, 16, context_length=77,
        transformer_width=512, transformer_heads=8, transformer_layers=2,
    ),
}


# ---------------------------------------------------------------------------
# ViT tower
# ---------------------------------------------------------------------------

class VisionTransformer(nn.Module):
    cfg: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, images, return_tokens: bool = False):
        """images: (B, H, W, 3) normalized float. Returns pooled (B, embed_dim)
        projected features, optionally also the raw token sequence
        (B, 1+P, width) after the transformer (pre-ln_post) — tgcir and
        blip-style heads consume tokens."""
        cfg = self.cfg
        p = cfg.vision_patch_size
        width = cfg.vision_width
        x = nn.Conv(width, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(images)
        b = x.shape[0]
        x = x.reshape(b, -1, width)
        cls = self.param("class_embedding", nn.initializers.normal(width ** -0.5),
                         (width,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, width)), x], axis=1)
        num_pos = (cfg.image_resolution // p) ** 2 + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(width ** -0.5),
                         (num_pos, width), jnp.float32)
        x = x + pos.astype(self.dtype)
        x = LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        x = Transformer(cfg.vision_layers, cfg.vision_heads, dtype=self.dtype,
                        remat=self.remat, name="transformer")(x)
        tokens = x
        pooled = LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(width ** -0.5),
                          (width, cfg.embed_dim), jnp.float32)
        pooled = pooled @ proj.astype(self.dtype)
        if return_tokens:
            return pooled, tokens
        return pooled


# ---------------------------------------------------------------------------
# ModifiedResNet tower (RN50x4)
# ---------------------------------------------------------------------------

class _BatchNorm(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="bn")(
            x.astype(jnp.float32)).astype(x.dtype)


def _avg_pool(x, window: int):
    return nn.avg_pool(x, (window, window), strides=(window, window))


class Bottleneck(nn.Module):
    """Anti-aliased bottleneck: stride realized as an avgpool after conv2
    (ref clip/model.py:10-56)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_BatchNorm(self.dtype, name="bn1")(y, train))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_BatchNorm(self.dtype, name="bn2")(y, train))
        if self.stride > 1:
            y = _avg_pool(y, self.stride)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _BatchNorm(self.dtype, name="bn3")(y, train)

        identity = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = _BatchNorm(self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pool over spatial positions with a learned positional
    embedding and a mean-token query (ref clip/model.py:58-91). The
    `F.multi_head_attention_forward` call becomes an explicit einsum."""

    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) -> tokens (B, HW, C)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, 1+HW, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5),
                         (h * w + 1, c), jnp.float32)
        tokens = tokens + pos.astype(self.dtype)

        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        hd = c // self.num_heads

        def split(t):
            return t.reshape(*t.shape[:-1], self.num_heads, hd)

        q, k, v = map(split, (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, 1, c)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    cfg: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False  # accepted for interface parity; conv towers are cheap

    @nn.compact
    def __call__(self, images, train: bool = False, return_tokens: bool = False):
        cfg = self.cfg
        width = cfg.vision_width
        x = images.astype(self.dtype)
        # 3-conv stem with trailing avgpool (ref clip/model.py:110-121)
        for i, (ch, stride) in enumerate(
            [(width // 2, 2), (width // 2, 1), (width, 1)], start=1
        ):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(_BatchNorm(self.dtype, name=f"bn{i}")(x, train))
        x = _avg_pool(x, 2)

        for stage, blocks in enumerate(cfg.vision_layers):
            planes = width * (2 ** stage)
            for blk in range(blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                x = Bottleneck(planes, stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{blk}")(x, train)

        pooled = AttentionPool2d(cfg.vision_heads, cfg.embed_dim,
                                 dtype=self.dtype, name="attnpool")(x)
        if return_tokens:
            b, h, w, c = x.shape
            return pooled, x.reshape(b, h * w, c)
        return pooled


# ---------------------------------------------------------------------------
# Text tower + full model
# ---------------------------------------------------------------------------

class TextTransformer(nn.Module):
    cfg: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, text_ids, return_tokens: bool = False):
        """text_ids: (B, context_length) int32. Pooled feature = EOT position
        (argmax of ids, ref clip/model.py:354) through ln_final + projection."""
        cfg = self.cfg
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.transformer_width), jnp.float32)
        x = emb.astype(self.dtype)[text_ids]
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.transformer_width), jnp.float32)
        x = x + pos.astype(self.dtype)[: x.shape[1]]
        # causal=True: the static mask folds into the packed Pallas kernel
        # on TPU (ops/attention_kernels.py), or is applied additively on the
        # einsum path — identical semantics to ref clip/model.py:293-298
        x = Transformer(cfg.transformer_layers, cfg.transformer_heads,
                        dtype=self.dtype, remat=self.remat, causal=True,
                        name="transformer")(x)
        x = LayerNorm(dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(text_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection",
                          nn.initializers.normal(cfg.transformer_width ** -0.5),
                          (cfg.transformer_width, cfg.embed_dim), jnp.float32)
        pooled = pooled @ proj.astype(self.dtype)
        if return_tokens:
            return pooled, x
        return pooled


class CLIP(nn.Module):
    """Full dual-encoder. Submodules are separately addressable so trainers
    can freeze/shard the image tower independently (stage-2 freezes vision,
    ref clip4cir/models.py:31-33)."""

    cfg: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        if self.cfg.is_vit:
            self.visual = VisionTransformer(self.cfg, self.dtype, self.remat)
        else:
            self.visual = ModifiedResNet(self.cfg, self.dtype, self.remat)
        self.text = TextTransformer(self.cfg, self.dtype, self.remat)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ())

    def encode_image(self, images, **kw):
        return self.visual(images, **kw)

    def encode_text(self, text_ids, **kw):
        return self.text(text_ids, **kw)

    def __call__(self, images, text_ids):
        img = self.encode_image(images)
        txt = self.encode_text(text_ids)
        return img, txt, self.logit_scale


def build_clip(name: str, dtype=jnp.float32, remat: bool = False) -> Tuple[CLIP, CLIPConfig]:
    cfg = CLIP_CONFIGS[name]
    return CLIP(cfg, dtype=dtype, remat=remat), cfg
