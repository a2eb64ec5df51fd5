"""Unicom vision transformer (DeepGlint), in flax — the SRM matcher's image
encoder.

Parity target: `zscir/unicom/vision_transformer.py:9-205` — a timm-style
pre-LN ViT with no CLS token, qkv projection WITHOUT bias, ReLU6 MLP, a
final f32 LayerNorm over all patch tokens, and a BatchNorm feature head over
the flattened (num_patches * dim) token concat:
  Linear(dim*P -> dim, no bias) -> BN(eps 2e-5) -> Linear(dim -> emb, no
  bias) -> BN(eps 2e-5)        (vision_transformer.py:26-30)
The SRM role normalizes the output embedding (zscir/srm_utils.py:52-57).

Geometries mirror `build_model` (vision_transformer.py:145-162); the CIR
pipeline uses ViT-L/14 (`zscir/srm_utils.py:37` unicom_name).

TPU-native: layers run under nn.scan (stacked params, one compiled block),
attention logits accumulate in f32, BatchNorm is inference-affine (running
stats folded at conversion time would also work; kept explicit for checkpoint
fidelity)."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UnicomConfig:
    input_size: int = 224
    patch_size: int = 14
    dim: int = 1024
    embedding_size: int = 768
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    @classmethod
    def vit_l14(cls) -> "UnicomConfig":
        return cls()

    @classmethod
    def vit_b32(cls) -> "UnicomConfig":
        return cls(patch_size=32, dim=768, embedding_size=512, depth=12,
                   num_heads=12)

    @classmethod
    def vit_b16(cls) -> "UnicomConfig":
        return cls(patch_size=16, dim=768, embedding_size=768, depth=12,
                   num_heads=12)

    @classmethod
    def tiny(cls) -> "UnicomConfig":
        return cls(input_size=28, patch_size=14, dim=32, embedding_size=16,
                   depth=2, num_heads=2)


def _ln(name: str):
    # torch nn.LayerNorm default eps=1e-5 (the reference uses defaults)
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class _Block(nn.Module):
    cfg: UnicomConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = cfg.num_heads
        hd = cfg.dim // h
        y = _ln("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        # qkv has NO bias (vision_transformer.py:82)
        qkv = nn.Dense(3 * cfg.dim, use_bias=False, dtype=self.dtype,
                       name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], h, hd)

        # attention math in f32 (the reference forces .float() here)
        q, k, v = map(lambda t: heads(t).astype(jnp.float32), (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        w = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(y.shape)
        y = nn.Dense(cfg.dim, dtype=self.dtype, name="proj")(
            ctx.astype(self.dtype))
        x = x + y
        y = _ln("norm2")(x.astype(jnp.float32)).astype(self.dtype)
        y = nn.Dense(cfg.dim * cfg.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = jnp.clip(y, 0.0, 6.0)  # ReLU6 (vision_transformer.py:66)
        y = nn.Dense(cfg.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class _ScanBlock(nn.Module):
    cfg: UnicomConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        return _Block(self.cfg, self.dtype, name="block")(x), None


class _BatchNormEval(nn.Module):
    """Inference-mode BatchNorm1d (running stats), eps 2e-5
    (vision_transformer.py:28-30)."""

    features: int
    eps: float = 2e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        x = x.astype(jnp.float32)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class UnicomViT(nn.Module):
    """images (B, H, W, 3) -> feature embeddings (B, embedding_size)."""

    cfg: UnicomConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        b = images.shape[0]
        x = nn.Conv(cfg.dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed")(
            images.astype(self.dtype))
        x = x.reshape(b, cfg.num_patches, cfg.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.num_patches, cfg.dim), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        scanned = nn.scan(_ScanBlock, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=cfg.depth,
                          in_axes=(nn.broadcast,))(
            cfg=cfg, dtype=self.dtype, name="blocks")
        x, _ = scanned(x, None)
        # final LN is computed in f32 on the reference path (forward_features)
        x = _ln("norm")(x.astype(jnp.float32))
        x = x.reshape(b, cfg.num_patches * cfg.dim)
        x = nn.Dense(cfg.dim, use_bias=False, dtype=jnp.float32,
                     name="feature_fc1")(x)
        x = _BatchNormEval(cfg.dim, name="feature_bn1")(x)
        x = nn.Dense(cfg.embedding_size, use_bias=False, dtype=jnp.float32,
                     name="feature_fc2")(x)
        x = _BatchNormEval(cfg.embedding_size, name="feature_bn2")(x)
        return x
