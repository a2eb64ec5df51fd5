"""TG-CIR backbone tests (ref tgcir/models.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.models.tgcir import TgcirCIR
from tests.fixtures import make_fiq


@pytest.fixture(scope="module")
def bb():
    return build_backbone("tgcir", clip_model_name="test-tiny", tau=0.05)


@pytest.fixture(scope="module")
def params(bb):
    return bb.init_params(jax.random.PRNGKey(0))


def test_token_shapes(bb, params):
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    tokens = bb.encode_image(params, imgs)
    assert tokens.shape == (2, 12, bb.hidden)  # 4 global + 8 local
    text = jnp.asarray(bb.tokenize(["a blue dress", "shorter sleeves"]))
    ttokens = bb.encode_text(params, text)
    assert ttokens.shape == (2, 12, bb.hidden)


def test_fusion_normalized(bb, params):
    imgs = jnp.ones((2, bb.input_dim, bb.input_dim, 3))
    tokens = bb.encode_image(params, imgs)
    text = jnp.asarray(bb.tokenize(["a", "b"]))
    q = bb.fuse(params, tokens, text)
    assert q.shape == (2, bb.hidden)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0,
                               rtol=1e-5)


def test_bank_features_pooling(bb, params):
    imgs = jnp.ones((3, bb.input_dim, bb.input_dim, 3))
    refer, target = bb.bank_features(params, imgs)
    assert refer.shape == (3, 12, bb.hidden)
    assert target.shape == (3, bb.hidden)
    want = np.asarray(refer).mean(axis=1)
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(target), want, atol=1e-5)


def test_stage2_freeze_filter(bb):
    assert not bb.trainable_filter(("params", "clip", "visual", "x"))
    assert not bb.trainable_filter(("params", "fc", "kernel"))
    assert not bb.trainable_filter(("params", "tokenlearn", "attn", "kernel"))
    assert not bb.trainable_filter(("params", "masks", "masks"))
    assert bb.trainable_filter(("params", "clip", "text", "x"))
    assert bb.trainable_filter(("params", "tokenlearn_text", "attn", "kernel"))
    assert bb.trainable_filter(("params", "masks_text", "masks"))
    assert bb.trainable_filter(("params", "s_remain", "fc1", "kernel"))
    assert bb.trainable_filter(("params", "text_fc", "kernel"))


def test_init_stage2_surgery(bb, params):
    p2 = TgcirCIR.init_stage2(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(p2["params"]["tokenlearn"]),
        jax.tree_util.tree_leaves(p2["params"]["tokenlearn_text"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(p2["params"]["masks"]["masks"]),
        np.asarray(p2["params"]["masks_text"]["masks"]))


def test_striped_mask_init(bb, params):
    masks = np.asarray(params["params"]["masks"]["masks"])
    g, d = masks.shape
    seg = d // g
    assert (masks[0, :seg] == 1.0).all()
    assert (masks[0, seg:] == 0.1).all()


def test_stage2_loss_and_grad(bb, params, rng):
    imgs = jnp.ones((4, bb.input_dim, bb.input_dim, 3))
    refer, target = bb.bank_features(params, imgs)
    bank = jnp.concatenate([target, -target])  # 8-image fake bank
    text = jnp.asarray(bb.tokenize([f"t{i}" for i in range(4)]))
    labels = jnp.array([0, 1, 2, 3])
    loss = bb.stage2_loss(params, refer, text, bank, labels, impl="xla")
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: bb.stage2_loss(p, refer, text, bank, labels,
                                          impl="xla"))(params)
    gate = g["params"]["s_remain"]["fc1"]["kernel"]
    assert bool(jnp.any(gate != 0))


def test_tgcir_train_e2e(bb, params, tmp_path):
    from spn4cir_tpu.bank.bank import extract_banks
    from spn4cir_tpu.data.datasets import CIRDataset, iter_train_bank, iter_unique_images
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.train.stage2 import create_train_state, train_epoch

    root = make_fiq(str(tmp_path / "fiq"))
    tf = ImageTransform("targetpad", bb.input_dim)
    ds = CIRDataset("fiq", "train", "relative", tf, root, ["dress"],
                    extend_suffix="tgcir")
    fn = jax.jit(lambda imgs: bb.bank_features(params, imgs))
    bank = extract_banks(fn, iter_unique_images(ds, 4, num_workers=0),
                         ds.num_unique_images)
    assert bank.refer.shape == (ds.num_unique_images, 12, bb.hidden)
    state = create_train_state(bb, params, 1e-3)
    state, loss = train_epoch(bb, state, bank, iter_train_bank(ds, 4),
                              impl="xla")
    assert np.isfinite(loss)
    # frozen image branch untouched
    np.testing.assert_array_equal(
        np.asarray(params["params"]["fc"]["kernel"]),
        np.asarray(state.params["params"]["fc"]["kernel"]))
