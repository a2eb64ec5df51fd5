"""Tensor-parallel tower sharding on the 8-device CPU mesh.

Verifies the Megatron-style param-sharding annotations: outputs match the
single-device tower, and the qkv / MLP kernels are actually split across
the 'model' axis (not silently replicated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.parallel.tp import (
    AXIS_MODEL, make_tp_encode, make_tp_mesh, shard_params_tp,
    tp_param_specs)


@pytest.fixture(scope="module")
def clip_bb():
    from spn4cir_tpu.models.api import build_backbone

    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    return bb, params


def test_tp_encode_matches_single_device(clip_bb, rng):
    bb, params = clip_bb
    mesh = make_tp_mesh(data=2, model=4)
    images = jnp.asarray(
        rng.standard_normal((4, bb.input_dim, bb.input_dim, 3)), jnp.float32)

    want = bb.gallery_features(params, images)
    fn, sharded = make_tp_encode(
        lambda p, im: bb.gallery_features(p, im), params, mesh)
    got = fn(sharded, images)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_params_actually_sharded(clip_bb):
    bb, params = clip_bb
    mesh = make_tp_mesh(data=2, model=4)
    sharded = shard_params_tp(params, mesh)

    blk = sharded["params"]["visual"]["transformer"]["blocks"]["block"]
    qkv = blk["attn"]["qkv"]["kernel"]
    full = qkv.shape[-1]
    shard = qkv.addressable_shards[0].data.shape[-1]
    assert shard == full // 4, (shard, full)

    fc = blk["mlp"]["fc"]["kernel"]
    assert fc.addressable_shards[0].data.shape[-1] == fc.shape[-1] // 4

    out = blk["attn"]["out"]["kernel"]
    assert out.addressable_shards[0].data.shape[-2] == out.shape[-2] // 4

    # LayerNorms replicated
    ln = blk["ln_1"]["ln"]["scale"]
    assert ln.addressable_shards[0].data.shape == ln.shape


def test_tp_indivisible_dims_fall_back_replicated():
    """A width not divisible by the model axis must replicate, not crash."""
    from spn4cir_tpu.models.layers import Transformer

    x = jnp.ones((2, 9, 20))
    mod = Transformer(num_layers=1, num_heads=2)
    params = mod.init(jax.random.PRNGKey(0), x)
    mesh = make_tp_mesh(data=1, model=8)  # qkv dim 60: 60 % 8 != 0
    specs = tp_param_specs(params, mesh)
    qkv_spec = specs["params"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert qkv_spec == jax.sharding.PartitionSpec()
    sharded = shard_params_tp(params, mesh)
    got = jax.jit(mod.apply)(sharded, x)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(mod.apply(params, x)),
                               rtol=1e-5, atol=1e-5)


def test_tp_eva_tower():
    """EVA ViT (the SURVEY §2.7 TP target) under (2 data, 4 model)."""
    from spn4cir_tpu.models.blip24cir import EvaViT, EvaViTConfig

    cfg = EvaViTConfig.tiny()
    mod = EvaViT(cfg)
    params = mod.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.standard_normal(
        (4, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    mesh = make_tp_mesh(data=2, model=4)
    fn, sharded = make_tp_encode(
        lambda p, im: mod.apply(p, im), params, mesh)
    got = fn(sharded, images)
    want = mod.apply(params, images)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_gallery_indexing_matches_plain(clip_bb, tmp_path_factory):
    """extract_index_features on a (data, model) mesh == single-device."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import extract_index_features
    from tests.fixtures import make_fiq

    bb, params = clip_bb
    root = make_fiq(str(tmp_path_factory.mktemp("fiq_tp")))
    tf = ImageTransform("targetpad", bb.input_dim)
    ds = CIRDataset("fiq", "val", "classic", tf, root, ["dress"])
    plain = extract_index_features(bb, params, ds, 4, num_workers=0)
    mesh = make_tp_mesh(data=2, model=4)
    tp = extract_index_features(bb, params, ds, 4, num_workers=0, mesh=mesh)
    assert tp.names == plain.names
    np.testing.assert_allclose(np.asarray(tp.target),
                               np.asarray(plain.target), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(tp.refer, plain.refer, rtol=2e-5, atol=2e-5)


def test_tp_med_bert_matches_single_device(rng):
    """BERT-family naming (MED encoder, Q-Former FFN) shards correctly."""
    from spn4cir_tpu.models.med import MedBert, MedConfig

    cfg = MedConfig.tiny(100)
    mod = MedBert(cfg)
    ids = jnp.asarray(rng.randint(0, 100, (4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), ids, mask)
    want = mod.apply(params, ids, mask)

    mesh = make_tp_mesh(data=2, model=4)
    specs = tp_param_specs(params, mesh)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s != jax.sharding.PartitionSpec(),
                               specs, is_leaf=lambda x: isinstance(
                                   x, jax.sharding.PartitionSpec)))
    assert any(flat), "no MED params were sharded"
    sharded = shard_params_tp(params, mesh)
    got = jax.jit(mod.apply)(sharded, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# LLaMA / LLaVA tensor parallelism (the datagen LMs)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_llama():
    from spn4cir_tpu.models.llama import LlamaConfig, LlamaLM

    cfg = LlamaConfig.tiny(vocab_size=128)
    params = LlamaLM(cfg).init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32)
    )["params"]
    return cfg, params


def _greedy_stream(params, cfg, embeds, cache_sharding=None):
    from spn4cir_tpu.models.llama import llama_generate

    return np.asarray(jax.jit(lambda p, e: llama_generate(
        p, cfg, e, eos_id=127, pad_id=127, max_new_tokens=12,
        cache_sharding=cache_sharding))(params, embeds))


def test_tp_llama_generate_matches_single_device(tiny_llama, rng):
    from spn4cir_tpu.parallel.tp import (llama_cache_sharding,
                                         shard_llama_params)

    cfg, params = tiny_llama
    mesh = make_tp_mesh(data=2, model=4)
    embeds = jnp.asarray(
        rng.standard_normal((2, 6, cfg.hidden_size)), jnp.float32)
    want = _greedy_stream(params, cfg, embeds)
    sharded = shard_llama_params(params, mesh)
    got = _greedy_stream(sharded, cfg, embeds,
                         cache_sharding=llama_cache_sharding(cfg, mesh))
    np.testing.assert_array_equal(got, want)


def test_tp_llama_int8_generate_matches_single_device(tiny_llama, rng):
    from spn4cir_tpu.models.llama import quantize_llama_weights
    from spn4cir_tpu.parallel.tp import (llama_cache_sharding,
                                         shard_llama_params)

    cfg, params = tiny_llama
    qparams = jax.jit(quantize_llama_weights)(params)
    mesh = make_tp_mesh(data=2, model=4)
    embeds = jnp.asarray(
        rng.standard_normal((2, 6, cfg.hidden_size)), jnp.float32)
    want = _greedy_stream(qparams, cfg, embeds)
    sharded = shard_llama_params(qparams, mesh)
    got = _greedy_stream(sharded, cfg, embeds,
                         cache_sharding=llama_cache_sharding(cfg, mesh))
    np.testing.assert_array_equal(got, want)


def test_tp_llama_params_actually_sharded(tiny_llama):
    from spn4cir_tpu.parallel.tp import shard_llama_params

    cfg, params = tiny_llama
    mesh = make_tp_mesh(data=2, model=4)
    sharded = shard_llama_params(params, mesh)
    layer = sharded["layers"]["layer"]

    q = layer["attn"]["q"]["kernel"]
    assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // 4
    down = layer["down"]["kernel"]
    assert down.addressable_shards[0].data.shape[-2] == down.shape[-2] // 4
    head = sharded["lm_head"]
    assert head.addressable_shards[0].data.shape[-1] == head.shape[-1] // 4
    emb = sharded["embed_tokens"]
    assert emb.addressable_shards[0].data.shape[-1] == emb.shape[-1] // 4
    ln = layer["input_ln"]["scale"]
    assert ln.addressable_shards[0].data.shape == ln.shape


def test_tp_rewriter_matches_single_device():
    """load_jax_rewriter(mesh=...) produces the same rewrites (the sampled
    top_k=10 stream is deterministic for a fixed seed/jax build)."""
    from spn4cir_tpu.datagen.llm_rewrite import load_jax_rewriter

    plain = load_jax_rewriter(tiny=True, seed=3, batch_size=2)
    mesh = make_tp_mesh(data=2, model=4)
    tp = load_jax_rewriter(tiny=True, seed=3, batch_size=2, mesh=mesh)
    pairs = [("a red dress", "a blue gown"), ("a shirt", "a striped top")]
    assert tp.rewrite_batch(pairs) == plain.rewrite_batch(pairs)


def test_tp_llava_captioner_matches_single_device(rng):
    """Tiny LLaVA captions under (2, 4) TP == single-device captions
    (T=0.01 sampling is near-argmax; fixed rng => deterministic)."""
    from spn4cir_tpu.datagen.captioner import make_llava_captioner
    from spn4cir_tpu.parallel.tp import shard_llava_params

    cap, transform, batched = make_llava_captioner(
        None, llava_size="tiny", batch_size=2)
    images = [rng.standard_normal(
        (cap.cfg.vision.image_size, cap.cfg.vision.image_size, 3)
    ).astype(np.float32) for _ in range(2)]
    want = batched(images, rng=jax.random.PRNGKey(7))

    mesh = make_tp_mesh(data=2, model=4)
    cap_tp, _, batched_tp = make_llava_captioner(
        None, llava_size="tiny", batch_size=2, mesh=mesh)
    got = batched_tp(images, rng=jax.random.PRNGKey(7))
    assert got == want

    # and the language model really is sharded
    params = cap.init_params(jax.random.PRNGKey(0))
    sharded = shard_llava_params(params, mesh)
    q = sharded["params"]["language_model"]["layers"]["layer"]["attn"]["q"][
        "kernel"]
    assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // 4
