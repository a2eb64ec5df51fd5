"""Fused Pallas ViT self-attention vs the XLA einsum path.

On this CPU host the kernel runs in Pallas interpreter mode; the same code
compiles via Mosaic on TPU (verified by tools/tower_bench.py on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.ops.attention_kernels import (
    MAX_PACKED_SEQ, MIN_FUSED_SEQ, _pack_geometry, fused_attention,
    fused_attention_pallas, packed_attention_pallas, should_fuse,
    should_pack)


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


# -- Packed small-S kernel ---------------------------------------------------

# Geometries chosen to exercise every packing branch: ViT-B/32 (sp == s, no
# padding at all), CLIP-text 77 (sp=80 padded tokens), bh not a g-multiple
# (padded head blocks), and a single-head edge.
@pytest.mark.parametrize("bh,s,d", [
    (24, 50, 64),    # ViT-B/32: sp == s exactly, bh % g == 0
    (13, 50, 64),    # padded head blocks (13 -> 16 for g=8)
    (9, 77, 64),     # padded tokens (sp=80) AND padded heads
    (2, 17, 32),     # tiny odd geometry
    (1, 128, 128),   # upper bound of the packed regime
])
def test_packed_forward_matches_xla(bh, s, d, rng):
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    got = packed_attention_pallas(q, k, v)
    want = _xla_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_forward_bf16(rng):
    q = jnp.asarray(rng.standard_normal((8, 50, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((8, 50, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((8, 50, 64)), jnp.bfloat16)
    got = packed_attention_pallas(q, k, v).astype(jnp.float32)
    want = _xla_reference(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("bh,s,d", [(24, 50, 64), (9, 77, 64)])
def test_packed_grads_match_xla(bh, s, d, rng):
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)

    got = jax.grad(
        lambda q, k, v: jnp.sum(packed_attention_pallas(q, k, v) * cot),
        argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(
        lambda q, k, v: jnp.sum(_xla_reference(q, k, v) * cot),
        argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


# -- Causal packed kernel ----------------------------------------------------

def _xla_causal_reference(q, k, v):
    s = q.shape[1]
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32)
    mask = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
    weights = jax.nn.softmax(logits + mask, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", weights.astype(q.dtype), v)


@pytest.mark.parametrize("bh,s,d", [
    (24, 77, 64),    # CLIP text geometry (padded tokens sp=80)
    (13, 50, 64),    # no token padding, padded head blocks
    (2, 17, 32),     # tiny odd geometry
])
def test_packed_causal_forward_matches_xla(bh, s, d, rng):
    from spn4cir_tpu.ops.attention_kernels import packed_causal_attention_pallas

    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    got = packed_causal_attention_pallas(q, k, v)
    want = _xla_causal_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_causal_grads_match_xla(rng):
    from spn4cir_tpu.ops.attention_kernels import packed_causal_attention_pallas

    bh, s, d = 9, 77, 64
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)

    got = jax.grad(
        lambda q, k, v: jnp.sum(packed_causal_attention_pallas(q, k, v) * cot),
        argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(
        lambda q, k, v: jnp.sum(_xla_causal_reference(q, k, v) * cot),
        argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_module_causal_packed_matches_einsum(rng):
    """A causal Transformer pinned to the packed kernel equals the einsum
    path with the additive causal mask (the CLIP text tower dispatch),
    incl. under remat (stage-1 grad-ckpt)."""
    from spn4cir_tpu.models.layers import Transformer

    x = jnp.asarray(rng.standard_normal((2, 21, 32)), jnp.float32)
    mod_x = Transformer(num_layers=2, num_heads=4, fused="xla", causal=True)
    params = mod_x.init(jax.random.PRNGKey(0), x)
    want = mod_x.apply(params, x)
    got = Transformer(num_layers=2, num_heads=4, fused="packed",
                      causal=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss(mod):
        return lambda p: jnp.sum(mod.apply(p, x) ** 2)

    mod_r = Transformer(num_layers=2, num_heads=4, fused="packed",
                        causal=True, remat=True)
    g_want = jax.grad(loss(mod_x))(params)
    g_got = jax.grad(loss(mod_r))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_got, g_want)


def test_packed_rejects_long_sequences(rng):
    from spn4cir_tpu.ops.attention_kernels import packed_attention_pallas

    q = jnp.zeros((2, 600, 16), jnp.float32)
    with pytest.raises(ValueError, match="short sequences"):
        packed_attention_pallas(q, q, q)


def test_pack_geometry_invariants():
    for s in (17, 50, 64, 77, 100, 128):
        sp, g, bhp = _pack_geometry(s, 13)
        assert sp >= s
        assert (g * sp) % 16 == 0
        assert bhp >= 13 and bhp % g == 0
    # ViT-B/32's S=50 must pack padding-free (the documented claim)
    sp, g, _ = _pack_geometry(50, 24)
    assert sp == 50 and g == 8


def test_packed_dispatch_policy():
    assert not should_pack(MAX_PACKED_SEQ + 1, 64, "packed")
    assert not should_pack(64, 160, "packed")  # head_dim too wide
    assert should_pack(50, 64, "packed")
    # auto never packs off-TPU (this host is CPU)
    assert should_pack(50, 64, "auto") == (jax.default_backend() == "tpu")
    # the two kernel regimes never overlap under auto
    assert MAX_PACKED_SEQ < MIN_FUSED_SEQ


def test_packed_dispatcher_branch(rng):
    q = jnp.asarray(rng.standard_normal((4, 26, 16)), jnp.float32) * 0.5
    k = jnp.asarray(rng.standard_normal((4, 26, 16)), jnp.float32) * 0.5
    v = jnp.asarray(rng.standard_normal((4, 26, 16)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused_attention(q, k, v, "packed")),
        np.asarray(_xla_reference(q, k, v)), rtol=1e-5, atol=1e-5)


def test_module_packed_matches_einsum(rng):
    """A Transformer stack pinned to the packed kernel equals einsum."""
    from spn4cir_tpu.models.layers import Transformer

    x = jnp.asarray(rng.standard_normal((2, 19, 32)), jnp.float32)
    mod_x = Transformer(num_layers=2, num_heads=4, fused="xla")
    params = mod_x.init(jax.random.PRNGKey(0), x)
    want = mod_x.apply(params, x)
    got = Transformer(num_layers=2, num_heads=4, fused="packed").apply(
        params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


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
