"""Shared flax building blocks for the CIR encoder towers.

TPU-first conventions used throughout the model zoo:
  - parameters live in float32; activations compute in a configurable
    `dtype` (bfloat16 on TPU) — the bf16 analog of the reference's fp16
    weights + fp32-LayerNorm trick (`clip4cir/clip/model.py:157-163,377-398`);
  - LayerNorm always accumulates in float32;
  - transformer stacks are `nn.scan`-rolled (one compiled layer body,
    stacked params) for fast XLA compiles, with optional `nn.remat`
    rematerialization replacing `torch.utils.checkpoint`
    (`clip4cir/models.py:155-159`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x) (ref clip/model.py:166-168)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm with forced float32 accumulation, output cast back."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln")(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class MultiHeadAttention(nn.Module):
    """Self/cross attention with a fused qkv projection for self-attention
    (keeps the OpenAI-CLIP `in_proj_weight` checkpoint layout convertible).

    Maskless self-attention (the ViT towers) routes through the fused Pallas
    kernel on TPU when the sequence is long enough to benefit
    (`ops/attention_kernels.py`); `fused='xla'` pins the einsum path,
    `fused='pallas'` forces the kernel (tests)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    out_features: Optional[int] = None
    fused: str = "auto"
    causal: bool = False  # static lower-triangular mask (CLIP text towers)

    @nn.compact
    def __call__(self, x, kv=None, mask=None):
        from spn4cir_tpu.ops import attention_kernels as _ak

        d = x.shape[-1]
        out_d = self.out_features or d
        head_dim = d // self.num_heads
        if kv is None:
            qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(d, dtype=self.dtype, name="q")(x)
            k = nn.Dense(d, dtype=self.dtype, name="k")(kv)
            v = nn.Dense(d, dtype=self.dtype, name="v")(kv)

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

        q, k, v = map(split_heads, (q, k, v))
        scale = head_dim ** -0.5

        # the static causal mask (CLIP text towers) is kernel-eligible,
        # unlike data-dependent padding masks (MED/BERT) which must stay on
        # the einsum path
        causal = self.causal
        if causal and mask is not None:
            raise ValueError("causal=True with an explicit mask")
        flat_ok = kv is None and mask is None and x.ndim == 3
        use_pack = flat_ok and _ak.should_pack(x.shape[1], head_dim,
                                               self.fused, causal=causal)
        if use_pack or (flat_ok and not causal
                        and _ak.should_fuse(x.shape[1], self.fused)):
            b, s = x.shape[0], x.shape[1]

            def flat(t):  # (B, S, H, Dh) -> (B*H, S, Dh)
                return t.transpose(0, 2, 1, 3).reshape(
                    b * self.num_heads, s, head_dim)

            kern = (_ak.fused_attention_pallas if not use_pack
                    else _ak.packed_causal_attention_pallas if causal
                    else _ak.packed_attention_pallas)
            o = kern(flat(q * scale), flat(k), flat(v))
            out = o.reshape(b, self.num_heads, s, head_dim).transpose(0, 2, 1, 3)
        else:
            logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            if causal:
                mask = causal_mask(x.shape[1])
            if mask is not None:
                logits = logits + mask.astype(jnp.float32)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("...hqk,...khd->...qhd", weights, v)
        out = out.reshape(*out.shape[:-2], d)
        return nn.Dense(out_d, dtype=self.dtype, name="out")(out)


class MLP(nn.Module):
    hidden_mult: float = 4.0
    act: Callable = quick_gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(int(d * self.hidden_mult), dtype=self.dtype, name="fc")(x)
        return nn.Dense(d, dtype=self.dtype, name="proj")(self.act(h))


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (CLIP style, ref clip/model.py:171-203;
    BLIP's timm-style ViT uses the same shape with exact GELU + eps 1e-6)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    act: Callable = quick_gelu
    mlp_mult: float = 4.0
    ln_eps: float = 1e-5
    fused: str = "auto"
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   fused=self.fused, causal=self.causal,
                                   name="attn")(
            LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_1")(x), mask=mask
        )
        x = x + MLP(self.mlp_mult, self.act, dtype=self.dtype, name="mlp")(
            LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_2")(x)
        )
        return x


class _ScanBlock(nn.Module):
    """Adapter giving ResidualAttentionBlock the (carry, *bcast) -> (carry, out)
    signature nn.scan requires."""

    num_heads: int
    dtype: Dtype = jnp.float32
    act: Callable = quick_gelu
    mlp_mult: float = 4.0
    ln_eps: float = 1e-5
    fused: str = "auto"
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        y = ResidualAttentionBlock(self.num_heads, dtype=self.dtype,
                                   act=self.act, mlp_mult=self.mlp_mult,
                                   ln_eps=self.ln_eps, fused=self.fused,
                                   causal=self.causal, name="block")(x, mask)
        return y, None


class Transformer(nn.Module):
    """A stack of pre-LN blocks, rolled with nn.scan (stacked params under
    'blocks'; leading axis = layer). `remat=True` rematerializes each block
    on the backward pass."""

    num_layers: int
    num_heads: int
    dtype: Dtype = jnp.float32
    act: Callable = quick_gelu
    mlp_mult: float = 4.0
    ln_eps: float = 1e-5
    remat: bool = False
    fused: str = "auto"
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        block_cls = _ScanBlock
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=())
        scanned = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
            in_axes=(nn.broadcast,),
        )(num_heads=self.num_heads, dtype=self.dtype, act=self.act,
          mlp_mult=self.mlp_mult, ln_eps=self.ln_eps, fused=self.fused,
          causal=self.causal, name="blocks")
        y, _ = scanned(x, mask)
        return y


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask matching CLIP's text tower
    (ref clip/model.py:293-298: zeros below diagonal, -inf above)."""
    mask = jnp.full((length, length), -jnp.inf, dtype)
    return jnp.triu(mask, k=1)
