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
