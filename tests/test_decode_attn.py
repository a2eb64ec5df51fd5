"""Fused decode-attention kernel (ops/decode_attn.py) vs the einsum path.

Runs in Pallas interpret mode on the CPU mesh (the kernel auto-interprets
off-TPU); the hardware A/B lives in tools/{llava,rewriter}_bench.py
--attn_kernel and BENCHMARKS.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.models.llama import (NEG_INF, LlamaConfig,
                                      init_llama_state, llama_decode_step,
                                      llama_generate, llama_prefill)
from spn4cir_tpu.ops.decode_attn import (decode_attention,
                                         supports_decode_attention)


def _ref_attention(q, k_cache, v_cache, li, bias, k_scale=None,
                   v_scale=None):
    """The einsum path's math (llama_decode_step), f64-free numpy."""
    k = np.asarray(k_cache[li], np.float32)   # (B, L, H*hd)
    v = np.asarray(v_cache[li], np.float32)
    B, H, hd = q.shape
    L = k.shape[1]
    kh = k.reshape(B, L, H, hd)
    vh = v.reshape(B, L, H, hd)
    logits = np.einsum("bhd,bkhd->bhk", np.asarray(q, np.float32),
                       kh) * hd ** -0.5
    if k_scale is not None:
        logits = logits * np.asarray(k_scale[li])[:, None, :]
    logits = logits + np.asarray(bias)[:, None, :]
    logits -= logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w /= w.sum(-1, keepdims=True)
    if v_scale is not None:
        w = w * np.asarray(v_scale[li])[:, None, :]
    return np.einsum("bhk,bkhd->bhd", w, vh)


def _bias(rng, B, L, pos):
    b = np.where(np.arange(L)[None, :] <= pos, 0.0, NEG_INF)
    b = np.broadcast_to(b, (B, L)).copy()
    # a few key-masked (left-pad) rows
    b[:, : rng.randint(1, 4)] = NEG_INF
    return jnp.asarray(b, jnp.float32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("layers,B,H,L", [(1, 2, 2, 128), (3, 3, 4, 256)])
def test_kernel_matches_einsum_math(rng, dtype, layers, B, H, L):
    hd = 128
    q = jnp.asarray(rng.randn(B, H, hd), jnp.float32)
    k = jnp.asarray(rng.randn(layers, B, L, H * hd), dtype)
    v = jnp.asarray(rng.randn(layers, B, L, H * hd), dtype)
    for li in range(layers):
        bias = _bias(rng, B, L, pos=L - 5)
        out = decode_attention(q, k, v, jnp.int32(li), bias)
        ref = _ref_attention(q, k, v, li, bias)
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   atol=tol, rtol=tol)


def test_kernel_int8_scales(rng):
    B, H, hd, L, layers = 2, 2, 128, 128, 2
    q = jnp.asarray(rng.randn(B, H, hd), jnp.float32)
    k = jnp.asarray(rng.randint(-127, 128, (layers, B, L, H * hd)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (layers, B, L, H * hd)), jnp.int8)
    ks = jnp.asarray(rng.rand(layers, B, L) * 0.1 + 0.01, jnp.float32)
    vs = jnp.asarray(rng.rand(layers, B, L) * 0.1 + 0.01, jnp.float32)
    bias = _bias(rng, B, L, pos=L - 2)
    out = decode_attention(q, k, v, jnp.int32(1), bias, ks, vs)
    assert out.dtype == jnp.float32
    ref = _ref_attention(q, k, v, 1, bias, ks, vs)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_supports_gate():
    assert supports_decode_attention(32, 32, 128, 512)
    assert not supports_decode_attention(32, 8, 128, 512)   # GQA
    assert not supports_decode_attention(4, 4, 64, 512)     # hd off-lane
    assert not supports_decode_attention(4, 4, 128, 100)    # L off-lane


def test_head_block_divisor_and_f32_budget():
    """Regression for the round-4 advisor findings: the head block must
    divide num_heads (a non-divisor grid would leave tail heads' output
    blocks unwritten) and the VMEM budget is taken at f32 width regardless
    of cache storage dtype (the kernel astype(f32)'s every head slice)."""
    from spn4cir_tpu.ops.decode_attn import VMEM_BUDGET, _pick_head_block

    # H=12: sub-blocks 6/4/3/2/1 violate the (multiple-of-8 or full-array)
    # block-shape rule, so the only legal block is the full 12 — or nothing.
    hb = _pick_head_block(12, 128, 512, 1)
    assert hb in (0, 12)
    for H in (8, 12, 16, 32):
        for L in (256, 2048, 8192):
            hb = _pick_head_block(H, 128, L, 1)
            if hb:
                assert H % hb == 0
                assert hb == H or hb % 8 == 0
                # int8 itemsize must NOT admit 4x the f32-safe block
                assert 2 * L * hb * 128 * 4 <= VMEM_BUDGET


def _lane_cfg(**kw):
    # smallest geometry the kernel gate accepts: hd = 128
    base = dict(vocab_size=96, hidden_size=256, num_layers=2, num_heads=2,
                intermediate_size=96, max_position_embeddings=256)
    base.update(kw)
    return LlamaConfig(**base)


def _tiny_params(cfg, seed=0):
    from spn4cir_tpu.models.llama import LlamaLM

    lm = LlamaLM(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    return lm.init(jax.random.PRNGKey(seed), input_ids=ids)["params"]


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_decode_step_kernel_vs_einsum(rng, cache_dtype):
    cfg = _lane_cfg()
    params = _tiny_params(cfg)
    B, P, L = 2, 5, 128
    state = init_llama_state(cfg, B, L, dtype=cache_dtype)
    emb = jnp.asarray(rng.randn(B, P, cfg.hidden_size), jnp.float32) * 0.1
    _, state = llama_prefill(params, cfg, state, emb)
    x = jnp.asarray(rng.randn(B, cfg.hidden_size), jnp.float32) * 0.1
    pos = jnp.int32(P)
    lo_ref, st_ref = llama_decode_step(params, cfg, state, x, pos)
    lo_k, st_k = llama_decode_step(params, cfg, state, x, pos,
                                   attn_kernel=True)
    tol = 1e-4 if cache_dtype == jnp.int8 else 1e-5
    np.testing.assert_allclose(np.asarray(lo_k), np.asarray(lo_ref),
                               atol=tol, rtol=tol)
    # layer >0 cache rows inherit the previous layer's ctx rounding, so
    # close-not-equal
    np.testing.assert_allclose(np.asarray(st_k.k, np.float32),
                               np.asarray(st_ref.k, np.float32),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("ragged", [False, True])
def test_generate_kernel_token_equality(rng, ragged):
    """Greedy generate with the kernel == einsum path, dense AND
    left-padded ragged (the kernel pads the cache; masked tails inert)."""
    cfg = _lane_cfg()
    params = _tiny_params(cfg)
    B, P, new = 2, 7, 6
    emb = jnp.asarray(rng.randn(B, P, cfg.hidden_size), jnp.float32) * 0.1
    am = None
    if ragged:
        am = jnp.asarray([[0, 0, 1, 1, 1, 1, 1], [1] * P], jnp.int32)
        emb = emb * am[..., None]
    kw = dict(eos_id=cfg.vocab_size - 1, pad_id=0, max_new_tokens=new,
              attention_mask=am)
    # attn_kernel=False pins the reference to the einsum path (the
    # production default is now ON, and this geometry passes the gate)
    ref = llama_generate(params, cfg, emb, attn_kernel=False, **kw)
    out = llama_generate(params, cfg, emb, attn_kernel=True, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_generate_kernel_with_chunked_prefill(rng):
    """The production rewriter config composes --attn_kernel with
    --prefill_chunk and left-padded ragged batches; token streams must
    still match the dense einsum path exactly."""
    cfg = _lane_cfg()
    params = _tiny_params(cfg)
    B, P, new = 2, 12, 6
    emb = jnp.asarray(rng.randn(B, P, cfg.hidden_size), jnp.float32) * 0.1
    am = jnp.asarray([[0] * 3 + [1] * (P - 3), [1] * P], jnp.int32)
    emb = emb * am[..., None]
    kw = dict(eos_id=cfg.vocab_size - 1, pad_id=0, max_new_tokens=new,
              attention_mask=am)
    ref = llama_generate(params, cfg, emb, attn_kernel=False, **kw)
    out = llama_generate(params, cfg, emb, attn_kernel=True,
                         prefill_chunk=4, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_generate_kernel_gate_falls_back(rng):
    """Off-lane head dims (the tiny HF-parity geometry) silently take the
    einsum path even with attn_kernel=True."""
    cfg = LlamaConfig.tiny()
    params = _tiny_params(cfg)
    emb = jnp.asarray(rng.randn(1, 4, cfg.hidden_size), jnp.float32) * 0.1
    ref = llama_generate(params, cfg, emb, eos_id=1, pad_id=0,
                         max_new_tokens=4)
    out = llama_generate(params, cfg, emb, eos_id=1, pad_id=0,
                         max_new_tokens=4, attn_kernel=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
