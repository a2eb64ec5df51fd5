"""Flax CLIP tower tests: shapes, dtype policy, determinism, and the full
backbone protocol surface (ref architecture: clip4cir/clip/model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.models.clip import CLIP_CONFIGS, build_clip


@pytest.fixture(scope="module")
def tiny():
    model, cfg = build_clip("test-tiny")
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((2, cfg.image_resolution, cfg.image_resolution, 3))
    txt = jnp.zeros((2, cfg.context_length), jnp.int32)
    params = model.init(rng, imgs, txt)
    return model, cfg, params


def test_clip_forward_shapes(tiny):
    model, cfg, params = tiny
    imgs = jnp.ones((2, cfg.image_resolution, cfg.image_resolution, 3))
    txt = jnp.full((2, cfg.context_length), 3, jnp.int32)
    img_f, txt_f, scale = model.apply(params, imgs, txt)
    assert img_f.shape == (2, cfg.embed_dim)
    assert txt_f.shape == (2, cfg.embed_dim)
    assert scale.shape == ()


def test_vit_token_output(tiny):
    model, cfg, params = tiny
    imgs = jnp.ones((2, cfg.image_resolution, cfg.image_resolution, 3))
    pooled, tokens = model.apply(params, imgs, method="encode_image",
                                 return_tokens=True)
    n_patches = (cfg.image_resolution // cfg.vision_patch_size) ** 2
    assert tokens.shape == (2, n_patches + 1, cfg.vision_width)


def test_eot_pooling_uses_argmax_position(tiny):
    model, cfg, params = tiny
    # same prefix, EOT at different positions -> different pooled outputs
    a = jnp.zeros((1, cfg.context_length), jnp.int32).at[0, 0].set(5).at[0, 3].set(100)
    b = jnp.zeros((1, cfg.context_length), jnp.int32).at[0, 0].set(5).at[0, 7].set(100)
    fa = model.apply(params, a, method="encode_text")
    fb = model.apply(params, b, method="encode_text")
    assert not np.allclose(np.asarray(fa), np.asarray(fb))


def test_causal_mask_blocks_future(tiny):
    model, cfg, params = tiny
    # changing a token AFTER the EOT argmax position must not change pooling
    base = jnp.zeros((1, cfg.context_length), jnp.int32).at[0, 0].set(7).at[0, 2].set(100)
    pert = base.at[0, 10].set(50)  # after EOT pos 2, and 50 < 100 keeps argmax
    fa = model.apply(params, base, method="encode_text")
    fb = model.apply(params, pert, method="encode_text")
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)


def test_bf16_activation_policy():
    model, cfg = build_clip("test-tiny", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3))
    txt = jnp.zeros((1, cfg.context_length), jnp.int32)
    params = model.init(rng, imgs, txt)
    # params stay f32
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype in (jnp.float32, jnp.int32) for l in leaves)
    img_f = model.apply(params, imgs, method="encode_image")
    assert img_f.dtype == jnp.bfloat16


def test_resnet_config_listed():
    cfg = CLIP_CONFIGS["RN50x4"]
    assert not cfg.is_vit
    assert cfg.vision_heads == 40
    assert cfg.image_resolution == 288


def test_modified_resnet_tiny_forward():
    from spn4cir_tpu.models.clip import CLIPConfig, ModifiedResNet

    cfg = CLIPConfig(16, 64, (1, 1, 1, 1), 8, None)
    tower = ModifiedResNet(cfg)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = tower.init(jax.random.PRNGKey(0), imgs)
    out = tower.apply(variables, imgs)
    assert out.shape == (1, 16)


def test_backbone_protocol_clip():
    bb = build_backbone("clip", clip_model_name="test-tiny", tau=0.05)
    params = bb.init_params(jax.random.PRNGKey(0))
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    refer = bb.encode_image(params, imgs)
    assert refer.shape == (2, bb.embed_dim)
    gal = bb.gallery_features(params, imgs)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(gal), axis=-1), 1.0, rtol=1e-5)
    ids = jnp.asarray(bb.tokenize(["a red dress", "a blue shirt"]))
    q = bb.fuse(params, refer, ids)
    assert q.shape == (2, bb.embed_dim)
    bank = gal
    labels = jnp.array([0, 1])
    loss = bb.stage2_loss(params, refer, ids, bank, labels, impl="xla")
    assert np.isfinite(float(loss))
    s1 = bb.stage1_loss(params, imgs, imgs, ids)
    assert np.isfinite(float(s1))


def test_trainable_filter_freezes_vision():
    bb = build_backbone("clip", clip_model_name="test-tiny")
    assert not bb.trainable_filter(("params", "visual", "transformer"))
    assert bb.trainable_filter(("params", "text", "transformer"))
