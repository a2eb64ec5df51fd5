"""Fused Pallas ViT self-attention vs the XLA einsum path.

On this CPU host the kernel runs in Pallas interpreter mode; the same code
compiles via Mosaic on TPU (verified by tools/tower_bench.py on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.ops.attention_kernels import (
    MIN_FUSED_SEQ, fused_attention, fused_attention_pallas, should_fuse)


def _xla_reference(q, k, v):
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jax.lax.dot_general(w, v, (((2,), (1,)), ((0,), (0,))))


@pytest.mark.parametrize("bh,s,d", [(6, 29, 16), (2, 128, 64), (3, 77, 40)])
def test_forward_matches_xla(bh, s, d, rng):
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    got = fused_attention_pallas(q, k, v)
    want = _xla_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_bf16(rng):
    q = jnp.asarray(rng.standard_normal((4, 50, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((4, 50, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((4, 50, 32)), jnp.bfloat16)
    got = fused_attention_pallas(q, k, v).astype(jnp.float32)
    want = _xla_reference(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_grads_match_xla(rng):
    bh, s, d = 3, 37, 24
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention_pallas(q, k, v) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v) * cot)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_dispatch_policy():
    assert not should_fuse(577, "xla")
    assert should_fuse(8, "pallas")
    # auto never fuses off-TPU (this host is CPU)
    assert should_fuse(MIN_FUSED_SEQ, "auto") == (
        jax.default_backend() == "tpu")


def test_fused_attention_dispatcher_xla_branch(rng):
    q = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(fused_attention(q, k, v, "auto")),
                               np.asarray(_xla_reference(q, k, v)),
                               rtol=1e-6, atol=1e-6)


def test_module_fused_matches_einsum(rng):
    """A Transformer stack pinned to the kernel equals the einsum path."""
    from spn4cir_tpu.models.layers import Transformer

    x = jnp.asarray(rng.standard_normal((2, 19, 32)), jnp.float32)
    mod_x = Transformer(num_layers=2, num_heads=4, fused="xla")
    params = mod_x.init(jax.random.PRNGKey(0), x)
    want = mod_x.apply(params, x)
    got = Transformer(num_layers=2, num_heads=4, fused="pallas").apply(
        params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_module_fused_grads(rng):
    from spn4cir_tpu.models.layers import Transformer

    x = jnp.asarray(rng.standard_normal((2, 17, 16)), jnp.float32)

    def make_loss(fused):
        mod = Transformer(num_layers=1, num_heads=2, fused=fused)
        return mod

    mod_x = make_loss("xla")
    params = mod_x.init(jax.random.PRNGKey(1), x)
    gw = jax.grad(lambda p: jnp.sum(mod_x.apply(p, x) ** 2))(params)
    mod_p = make_loss("pallas")
    gg = jax.grad(lambda p: jnp.sum(mod_p.apply(p, x) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4), gg, gw)
