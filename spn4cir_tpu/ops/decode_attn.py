"""Fused decode-step attention: q · K-cache -> softmax -> · V-cache in one
VMEM pass per (batch row, head block).

Why a kernel here and not for the matmuls: the round-4 decode decomposition
(BENCHMARKS.md) showed the per-step GEMMs already run weight-bound at 74%
of the HBM stream floor under XLA, but attention runs ~2.2x its cache-read
floor and past B=8 the full step exceeds the sum of its parts — the f32
logit/softmax temps round-trip HBM and contend with the weight stream. This
kernel keeps the (L,) logits, the softmax statistics, and the weights in
VMEM: each K/V cache row crosses HBM exactly once per step, which IS the
floor. (Contrast `ops/quant_matmul.py`, reverted after losing to XLA's own
MXU schedule on the compute side — this kernel targets the bandwidth side
XLA demonstrably does not close.)

Semantics match the einsum path in `models/llama.py:llama_decode_step`:

    logits = einsum('bhd,bkhd->bhk', q, K) * hd**-0.5   [* k_scale]
    w      = softmax(logits + bias)      .astype(V.dtype) [* v_scale]
    ctx    = einsum('bhk,bkhd->bhd', w, V)

with the int8-cache per-row scales applied exactly where the XLA path
applies them (after the K contraction; folded into the softmax weights for
V). `bias` carries BOTH the causal position mask and the left-padding key
mask as a single (B, L) additive term (NEG_INF rows vanish under exp —
-1e9 underflows to exactly 0.0 in f32, so padded cache tails are inert).

Layout: the kernel takes the WHOLE stacked KV cache (n_layers, B, L, H*hd)
plus the traced layer index as a scalar-prefetch operand — the index map
selects layer li's block, so the per-layer slice never materializes in HBM
(a `dynamic_slice` feeding an opaque pallas_call would copy the full layer
— an extra cache read+write per step, the very traffic this kernel
removes). Within a block, head j's columns [j*hd, (j+1)*hd) are sliced
statically (hd = 128 = one lane tile): no transpose or head expansion.
GQA (n_rep > 1) falls back to the einsum path; both 7B configs are MHA.

Decode is inference-only — no VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Per-program VMEM budget for the K+V blocks (leaves headroom in ~16 MB for
# logits/weights temps and the out block).
VMEM_BUDGET = 8 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_head_block(num_heads: int, head_dim: int, length: int,
                     itemsize: int) -> int:
    """Largest legal head-block size, or 0 when none exists.

    Legal means all of:
    - divides num_heads (the grid's head dim is num_heads // hb FULL
      blocks — a non-divisor would leave tail heads' output unwritten);
    - satisfies the TPU block-shape rule for the (1, hb, hd) q/out blocks:
      a block's second-to-last dim must be a multiple of 8 or equal the
      full array dim (hb == num_heads);
    - fits the VMEM budget at f32 width regardless of storage dtype: the
      kernel astype(f32)'s each head slice inside VMEM and the head loop
      is fully unrolled, so the live set tracks the f32 copies (an int8
      block budgeted at its own itemsize would admit 4x the safe size).
    """
    del itemsize  # budget is always at f32 width, see above
    for hb in range(num_heads, 0, -1):
        if num_heads % hb:
            continue
        if hb != num_heads and hb % 8:
            continue
        if 2 * length * hb * head_dim * 4 <= VMEM_BUDGET:
            return hb
    return 0


def supports_decode_attention(num_heads: int, kv_heads: int, head_dim: int,
                              length: int) -> bool:
    """Geometry gate: MHA only, lane-tiled head dim, lane-tiled cache length
    (llama_generate pads the cache to a 128 multiple when the kernel is
    requested), and a legal head block within the VMEM budget."""
    if kv_heads != num_heads:
        return False
    if head_dim % LANES or length % LANES:
        return False
    return _pick_head_block(num_heads, head_dim, length, 4) > 0


def _kernel(li_ref, q_ref, k_ref, v_ref, bias_ref, *rest, hb, hd, quant):
    del li_ref  # consumed by the index maps
    if quant:
        ks_ref, vs_ref, out_ref = rest
    else:
        ks_ref = vs_ref = None
        (out_ref,) = rest
    bias = bias_ref[0]  # block (1, 1, L) -> (1, L) f32
    scale = hd ** -0.5
    rows = []
    for j in range(hb):
        qj = q_ref[:, j, :].astype(jnp.float32)        # (1, hd)
        kj = k_ref[0, 0, :, j * hd:(j + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qj, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (1, L)
        if ks_ref is not None:
            logits = logits * ks_ref[0, 0]  # block (1,1,1,L) -> (1, L)
        logits = logits + bias
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=1, keepdims=True)       # (1, L) f32
        vj = v_ref[0, 0, :, j * hd:(j + 1) * hd]
        if vs_ref is not None:
            w = w * vs_ref[0, 0]
            vj = vj.astype(jnp.float32)
        else:
            # the einsum path casts the weights to the cache dtype before
            # the V contraction; mirror its rounding
            w = w.astype(vj.dtype)
        ctx = jax.lax.dot_general(
            w, vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (1, hd)
        rows.append(ctx)
    out = jnp.concatenate(rows, axis=0)                 # (hb, hd)
    out_ref[0] = out.astype(out_ref.dtype)


def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, li: jnp.ndarray,
                     bias: jnp.ndarray,
                     k_scale: Optional[jnp.ndarray] = None,
                     v_scale: Optional[jnp.ndarray] = None,
                     *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """q (B, H, hd); k_cache/v_cache (n_layers, B, L, H*hd) in storage dtype
    (f32/bf16/int8); li traced scalar layer index; bias (B, L) f32 additive
    mask; k_scale/v_scale (n_layers, B, L) f32 per-row scales for the int8
    cache. Returns ctx (B, H, hd) in the einsum path's output dtype
    (v.dtype for float caches, f32 for int8)."""
    batch, num_heads, hd = q.shape
    length = k_cache.shape[2]
    quant = k_scale is not None
    if interpret is None:
        interpret = _interpret()
    hb = _pick_head_block(num_heads, hd, length, k_cache.dtype.itemsize)
    if hb <= 0:
        raise ValueError(
            f"no legal head block for H={num_heads} hd={hd} L={length}; "
            "gate callers with supports_decode_attention()")
    out_dtype = jnp.float32 if quant else v_cache.dtype

    grid = (batch, num_heads // hb)
    cache_spec = pl.BlockSpec((1, 1, length, hb * hd),
                              lambda b, h, li: (li[0], b, 0, h))
    # TPU block-shape rule: a block's last two dims must be multiples of
    # (8, 128) or EQUAL the full array dims. Feed bias/scales with a unit
    # row dim — (B, 1, L) / (layers, B, 1, L) — so every per-row block is
    # (.., 1, L) with both trailing dims equal to the array's.
    in_specs = [
        pl.BlockSpec((1, hb, hd), lambda b, h, li: (b, h, 0)),    # q
        cache_spec,                                               # k
        cache_spec,                                               # v
        pl.BlockSpec((1, 1, length), lambda b, h, li: (b, 0, 0)),  # bias
    ]
    args = [q, k_cache, v_cache, bias[:, None, :]]
    if quant:
        scale_spec = pl.BlockSpec((1, 1, 1, length),
                                  lambda b, h, li: (li[0], b, 0, 0))
        in_specs += [scale_spec, scale_spec]
        args += [k_scale[:, :, None, :], v_scale[:, :, None, :]]
    fn = pl.pallas_call(
        functools.partial(_kernel, hb=hb, hd=hd, quant=quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, hd),
                                   lambda b, h, li: (b, h, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, num_heads, hd), out_dtype),
        interpret=interpret,
    )
    return fn(jnp.reshape(li, (1,)).astype(jnp.int32), *args)
