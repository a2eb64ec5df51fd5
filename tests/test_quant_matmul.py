"""Fused int8 weight-streaming matmul (ops/quant_matmul.py) vs the XLA
dequant oracle, and the llama_generate quant_kernel routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.ops.quant_matmul import quant_matmul


def _quantize(w):
    absmax = np.max(np.abs(w), axis=0)
    scales = np.maximum(absmax, 1e-12) / 127.0
    vals = np.clip(np.round(w / scales[None, :]), -127, 127).astype(np.int8)
    return vals, scales.astype(np.float32)


@pytest.mark.parametrize("b,d,f", [
    (8, 128, 256),
    (3, 128, 256),    # batch below the sublane tile: pad + unpad
    (8, 256, 160),    # ragged F: edge block clipped, not masked
    (1, 64, 512),
])
def test_quant_matmul_matches_oracle(rng, b, d, f):
    w = rng.standard_normal((d, f)).astype(np.float32)
    vals, scales = _quantize(w)
    x = rng.standard_normal((b, d)).astype(np.float32)

    want = (x @ vals.astype(np.float32)) * scales[None, :]
    got = jax.jit(quant_matmul)(jnp.asarray(x), jnp.asarray(vals),
                                jnp.asarray(scales))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_quant_matmul_multi_row_blocks(rng):
    """Prefill-scale rows: ragged row count across several row blocks."""
    w = rng.standard_normal((64, 384)).astype(np.float32)
    vals, scales = _quantize(w)
    x = rng.standard_normal((37, 64)).astype(np.float32)
    want = (x @ vals.astype(np.float32)) * scales[None, :]
    got = quant_matmul(jnp.asarray(x), jnp.asarray(vals),
                       jnp.asarray(scales), block_f=128, block_b=16)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_quant_matmul_3d_input(rng):
    """Prefill shape: (B, P, D) flattens through the kernel."""
    vals, scales = _quantize(rng.standard_normal((64, 128)).astype(np.float32))
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    want = (x @ vals.astype(np.float32)) * scales[None, None, :]
    got = quant_matmul(jnp.asarray(x), jnp.asarray(vals), jnp.asarray(scales))
    assert got.shape == (2, 5, 128)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_quant_matmul_bf16_input(rng):
    vals, scales = _quantize(rng.standard_normal((64, 128)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.bfloat16)
    got = quant_matmul(x, jnp.asarray(vals), jnp.asarray(scales))
    assert got.dtype == jnp.bfloat16
    want = (x.astype(jnp.float32) @ jnp.asarray(vals, jnp.float32)
            ) * jnp.asarray(scales)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_llama_generate_quant_kernel_stream_matches_fallback(rng):
    """Tiny int8 LM: greedy token streams identical with the fused kernel
    forced on vs the XLA dequant path."""
    from spn4cir_tpu.models.llama import (LlamaConfig, LlamaLM,
                                          llama_generate,
                                          quantize_llama_weights)

    cfg = LlamaConfig.tiny(vocab_size=128)
    params = LlamaLM(cfg).init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32)
    )["params"]
    qparams = jax.jit(quantize_llama_weights)(params)
    embeds = jnp.asarray(
        rng.standard_normal((2, 6, cfg.hidden_size)), jnp.float32)

    def run(use_kernel):
        return np.asarray(jax.jit(lambda p, e: llama_generate(
            p, cfg, e, eos_id=127, pad_id=127, max_new_tokens=10,
            quant_kernel=use_kernel))(qparams, embeds))

    np.testing.assert_array_equal(run(True), run(False))
