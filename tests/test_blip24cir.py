"""blip24cir (Q-Former) backbone tests
(ref blip2_qformer_cir_align_prompt.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.models.blip24cir import Blip2CIR


@pytest.fixture(scope="module")
def bb():
    return build_backbone("blip2", blip2_size="test-tiny", tau=0.05)


@pytest.fixture(scope="module")
def params(bb):
    return bb.init_params(jax.random.PRNGKey(0))


def test_shapes(bb, params):
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    embeds = bb.encode_image(params, imgs)
    assert embeds.shape == (2, bb.vit_cfg.num_tokens, bb.vit_cfg.width)
    target = bb.gallery_features(params, imgs)
    nq = bb.q_cfg.num_query_tokens
    assert target.shape == (2, nq, 256)
    norms = np.linalg.norm(np.asarray(target), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_fusion_bank_features(bb, params):
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    text = jnp.asarray(bb.tokenize(["a blue dress", "a red shirt"]))
    fused, target = bb.fusion_bank_features(params, imgs, text)
    nq = bb.q_cfg.num_query_tokens
    assert fused.shape == (2, nq, bb.q_cfg.hidden_size)
    assert target.shape == (2, nq, 256)
    # fusion depends on the caption
    text2 = jnp.asarray(bb.tokenize(["something different", "entirely else"]))
    fused2, _ = bb.fusion_bank_features(params, imgs, text2)
    assert not np.allclose(np.asarray(fused), np.asarray(fused2), atol=1e-5)


def test_stage2_loss_and_trainability(bb, params):
    imgs = jnp.ones((3, bb.input_dim, bb.input_dim, 3))
    text = jnp.asarray(bb.tokenize(["a", "b", "c"]))
    fused, target = bb.fusion_bank_features(params, imgs, text)
    bank = jnp.concatenate([target, -target])  # (6, nq, 256)
    labels = jnp.array([0, 1, 2])
    loss = bb.stage2_loss(params, fused, text, bank, labels)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: bb.stage2_loss(p, fused, text, bank, labels))(params)
    assert bool(jnp.any(
        jax.tree_util.tree_leaves(g["params"]["qformer_query"])[0] != 0))
    # filter: only qformer_query / text_proj_q / tau train
    assert bb.trainable_filter(("params", "qformer_query", "pairs"))
    assert bb.trainable_filter(("params", "text_proj_q", "kernel"))
    assert bb.trainable_filter(("params", "tau"))
    assert not bb.trainable_filter(("params", "qformer", "pairs"))
    assert not bb.trainable_filter(("params", "visual_encoder", "blocks"))
    assert not bb.trainable_filter(("params", "vision_proj", "kernel"))
    assert not bb.trainable_filter(("params", "text_proj", "kernel"))
    assert not bb.trainable_filter(("params", "query_tokens",))


def test_init_stage2_surgery(bb, params):
    p2 = Blip2CIR.init_stage2(params)
    src = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_leaves_with_path(p2["params"]["qformer"])}
    dst = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_leaves_with_path(p2["params"]["qformer_query"])}
    # the copy drops cross-attn (never used by the text re-read) but matches
    # everywhere else
    assert set(dst) <= set(src)
    assert all("cross_attn" in k for k in set(src) - set(dst))
    for k, v in dst.items():
        np.testing.assert_array_equal(np.asarray(src[k]), np.asarray(v))
    # structure identical to a fresh init (optimizer masks line up)
    fresh = bb.init_params(jax.random.PRNGKey(1))
    assert (jax.tree_util.tree_structure(fresh)
            == jax.tree_util.tree_structure({"params": p2["params"]}))
    np.testing.assert_array_equal(
        np.asarray(p2["params"]["text_proj"]["kernel"]),
        np.asarray(p2["params"]["text_proj_q"]["kernel"]))


def test_max_query_scoring(bb, params, rng):
    q = jnp.asarray(rng.randn(3, 256).astype(np.float32))
    gallery = jnp.asarray(rng.randn(7, bb.q_cfg.num_query_tokens, 256).astype(np.float32))
    scores = bb.score_queries(q, gallery)
    assert scores.shape == (3, 7)
    want = np.einsum("bd,mqd->bmq", np.asarray(q), np.asarray(gallery)).max(-1)
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5, atol=1e-5)


def test_pre_caption():
    assert Blip2CIR.pre_caption("Make it MORE blue!") == "make it more blue"
    assert Blip2CIR.pre_caption("a.b;c(d)") == "a b c d"


def test_fused_eval_path(bb, params):
    """inference(): frozen fusion + trainable re-read, query masked by pads."""
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    embeds = bb.encode_image(params, imgs)
    text = jnp.asarray(bb.tokenize(["a dress", "blue shirt"]))
    feats = bb.fuse(params, embeds, text)
    assert feats.shape == (2, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0,
                               rtol=1e-5)
    # padded text positions must not change the result
    ids = text[:, 0, :].at[0, -1].set(3)
    text2 = jnp.stack([ids, text[:, 1, :]], axis=1)
    feats2 = bb.fuse(params, embeds, text2)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2), atol=1e-6)


def test_blip2_bank_extraction_e2e(bb, params, tmp_path):
    from spn4cir_tpu.bank.bank import extract_fusion_banks
    from spn4cir_tpu.data.datasets import CIRDataset, iter_train_images
    from spn4cir_tpu.data.transforms import ImageTransform
    from tests.fixtures import make_fiq

    root = make_fiq(str(tmp_path / "fiq"))
    tf = ImageTransform("targetpad", bb.input_dim)
    ds = CIRDataset("fiq", "train", "relative", tf, root, ["dress"])
    fn = jax.jit(lambda imgs, txt: bb.fusion_bank_features(params, imgs, txt))
    bank = extract_fusion_banks(
        fn, iter_train_images(ds, 4, num_workers=0), len(ds.triplets),
        ds.num_unique_images, bb.tokenize)
    nq = bb.q_cfg.num_query_tokens
    assert bank.refer.shape == (len(ds.triplets), nq, bb.q_cfg.hidden_size)
    assert bank.target.shape == (ds.num_unique_images, nq, 256)
    # by_image (plus) variant
    bank2 = extract_fusion_banks(
        fn, iter_train_images(ds, 4, num_workers=0), len(ds.triplets),
        ds.num_unique_images, bb.tokenize, by_image=True)
    assert bank2.refer.shape == (ds.num_unique_images, nq, bb.q_cfg.hidden_size)
