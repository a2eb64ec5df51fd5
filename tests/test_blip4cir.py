"""blip4cir backbone + WordPiece tokenizer + MED BERT tests
(ref blip4cir/blip_cir.py, blip4cir/med.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.tokenizer.wordpiece import BertTokenizer, tiny_test_vocab


@pytest.fixture(scope="module")
def bb():
    return build_backbone("blip", blip_size="test-tiny", tau=0.05)


@pytest.fixture(scope="module")
def params(bb):
    return bb.init_params(jax.random.PRNGKey(0))


# ---- tokenizer ----

def test_wordpiece_basics():
    tok = BertTokenizer(vocab=tiny_test_vocab())
    ids = tok.encode("a blue dress")
    assert ids == [tok.vocab["a"], tok.vocab["blue"], tok.vocab["dress"]]
    # greedy longest-match with ## continuation
    assert tok.encode("dresss") == [tok.vocab["dress"], tok.vocab["##s"]]
    # unknown chars -> UNK
    assert tok.encode("€") == [tok.unk_id]


def test_wordpiece_batch_and_enc_swap():
    tok = BertTokenizer(vocab=tiny_test_vocab())
    ids, mask = tok(["a dress", "blue"], max_length=8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids[0, 0] == tok.cls_id
    assert mask[0].sum() == 4  # CLS a dress SEP
    ids2, _ = tok(["a dress"], max_length=8, replace_cls_with_enc=True)
    assert ids2[0, 0] == tok.enc_token_id


def test_wordpiece_punctuation_and_case():
    tok = BertTokenizer(vocab=tiny_test_vocab(extra_words=[",", "!"]))
    assert tok.encode("A Blue, dress!") == [
        tok.vocab["a"], tok.vocab["blue"], tok.vocab[","],
        tok.vocab["dress"], tok.vocab["!"]]


def test_blip_special_tokens_appended():
    tok = BertTokenizer(vocab=tiny_test_vocab())
    assert tok.dec_token_id == tok.vocab_size - 2
    assert tok.enc_token_id == tok.vocab_size - 1


# ---- model ----

def test_blip_shapes(bb, params):
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    tokens = bb.encode_image(params, imgs)
    n_tok = (bb.input_dim // bb.vit_cfg.patch_size) ** 2 + 1
    assert tokens.shape == (2, n_tok, bb.vit_cfg.width)
    pooled = bb.gallery_features(params, imgs)
    assert pooled.shape == (2, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pooled), axis=-1),
                               1.0, rtol=1e-5)


def test_blip_fusion_cross_attends(bb, params):
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    tokens = bb.encode_image(params, imgs)
    text = jnp.asarray(bb.tokenize(["a blue dress", "a red shirt"]))
    assert text.shape[1] == 2  # [ids; mask] packing
    q = bb.fuse(params, tokens, text)
    assert q.shape == (2, 256)
    # changing the reference image must change the fused query (cross-attn live)
    q2 = bb.fuse(params, tokens * 0.5, text)
    assert not np.allclose(np.asarray(q), np.asarray(q2), atol=1e-5)


def test_blip_learnable_tau_grad(bb, params):
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    refer, target = bb.bank_features(params, imgs)
    bank = jnp.concatenate([target, -target])
    text = jnp.asarray(bb.tokenize(["a", "b"]))
    labels = jnp.array([0, 1])
    g = jax.grad(lambda p: bb.stage2_loss(p, refer, text, bank, labels,
                                          impl="xla"))(params)
    assert abs(float(g["params"]["tau"])) > 0  # tau is learnable (quirk §8.10)
    # frozen tower grads exist in pytree but optimizer masks them
    assert not bb.trainable_filter(("params", "visual_encoder", "x"))
    assert not bb.trainable_filter(("params", "vision_proj", "kernel"))
    assert bb.trainable_filter(("params", "text_encoder", "layers"))
    assert bb.trainable_filter(("params", "tau"))
    assert bb.trainable_filter(("params", "text_proj", "kernel"))


def test_blip_train_step(bb, params, rng):
    from spn4cir_tpu.train.stage2 import create_train_state, stage2_train_step

    imgs = jnp.asarray(rng.rand(4, bb.input_dim, bb.input_dim, 3).astype(np.float32))
    refer, target = bb.bank_features(params, imgs)
    bank = target
    text = jnp.asarray(bb.tokenize([f"dress {i}" for i in range(4)]))
    state = create_train_state(bb, params, 1e-3)
    batch = {"refer_feats": refer, "text_ids": text,
             "labels": jnp.array([0, 1, 2, 3])}
    state, loss = stage2_train_step(bb, state, bank, batch, "xla")
    assert np.isfinite(float(loss))
    # vision frozen
    np.testing.assert_array_equal(
        np.asarray(params["params"]["vision_proj"]["kernel"]),
        np.asarray(state.params["params"]["vision_proj"]["kernel"]))
    # tau moved
    assert float(state.params["params"]["tau"]) != float(params["params"]["tau"])


def test_med_cross_attention_mask(bb, params):
    """Padding positions must not affect the fused feature."""
    imgs = jnp.ones((1, bb.input_dim, bb.input_dim, 3))
    tokens = bb.encode_image(params, imgs)
    t1 = jnp.asarray(bb.tokenize(["a dress"]))
    # corrupt ids in padded region only
    ids = t1[:, 0, :].at[0, -1].set(5)
    t2 = jnp.stack([ids, t1[:, 1, :]], axis=1)
    q1 = bb.fuse(params, tokens, t1)
    q2 = bb.fuse(params, tokens, t2)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
