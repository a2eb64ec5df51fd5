"""BLIP's timm-style ViT in flax (exact GELU, LN eps 1e-6, no projection).

Parity target: `blip4cir/vit.py` (`VisionTransformer`, 551 LoC with
attention-map hooks and per-block torch checkpointing) and `create_vit`
(`blip4cir/blip.py:197-213`): 'base' = ViT-B/16 at 384px -> (B, 577, 768).

TPU-native: the per-block `torch.utils.checkpoint` becomes nn.remat over the
scan-rolled stack; hooks are dropped (analysis tooling reads activations
functionally)."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from spn4cir_tpu.models.layers import LayerNorm, Transformer


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


@dataclasses.dataclass(frozen=True)
class BlipViTConfig:
    image_size: int = 384
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12

    @classmethod
    def base(cls) -> "BlipViTConfig":
        return cls()

    @classmethod
    def large(cls) -> "BlipViTConfig":
        return cls(image_size=384, patch_size=16, width=1024, layers=24, heads=16)

    @classmethod
    def tiny(cls) -> "BlipViTConfig":
        return cls(image_size=32, patch_size=16, width=32, layers=2, heads=2)

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


class BlipViT(nn.Module):
    cfg: BlipViTConfig
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, images):
        """(B, H, W, 3) -> (B, 1+P, width) token embeddings after final LN."""
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
        x = Transformer(cfg.layers, cfg.heads, dtype=self.dtype, act=_gelu,
                        ln_eps=1e-6, remat=self.remat, name="blocks")(x)
        return LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
