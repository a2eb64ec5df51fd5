"""End-to-end tiny slice on CPU (SURVEY.md §4/§7 milestone 3): synthetic
FashionIQ -> bank extraction -> stage-2 train steps -> validation metrics.
Mirrors the reference flagship flow `clip4cir/train.py` (SURVEY.md §3.1)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.bank.bank import Bank, extract_banks
from spn4cir_tpu.data.datasets import CIRDataset, iter_train_bank, iter_unique_images
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.eval.retrieval import (
    cirr_val_retrieval,
    extract_index_features,
    fiq_val_retrieval,
)
from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.train.stage2 import create_train_state, train_epoch
from tests.fixtures import make_cirr, make_fiq


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    return make_fiq(str(tmp_path_factory.mktemp("fiq")))


@pytest.fixture(scope="module")
def cirr_root(tmp_path_factory):
    return make_cirr(str(tmp_path_factory.mktemp("cirr")))


@pytest.fixture(scope="module")
def backbone():
    return build_backbone("clip", clip_model_name="test-tiny", tau=0.05)


@pytest.fixture(scope="module")
def params(backbone):
    return backbone.init_params(jax.random.PRNGKey(0))


TF = ImageTransform("targetpad", 32)


def _extract(backbone, params, ds, cache=None, reload=False):
    fn = jax.jit(lambda imgs: backbone.bank_features(params, imgs))
    return extract_banks(
        fn, iter_unique_images(ds, 4, num_workers=0), ds.num_unique_images,
        cache_path=cache, reload=reload)


def test_bank_extraction_and_cache(backbone, params, fiq_root, tmp_path):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    cache = str(tmp_path / "bank.npz")
    bank = _extract(backbone, params, ds, cache)
    assert bank.refer.shape == (ds.num_unique_images, backbone.embed_dim)
    assert bank.target.shape == bank.refer.shape
    norms = np.linalg.norm(np.asarray(bank.target), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    assert os.path.exists(cache)
    # cache round-trip is bit-exact
    bank2 = _extract(backbone, params, ds, cache)
    np.testing.assert_array_equal(bank.refer, bank2.refer)
    # reload=True recomputes (same values here)
    bank3 = _extract(backbone, params, ds, cache, reload=True)
    np.testing.assert_allclose(bank.refer, bank3.refer, atol=1e-6)


def test_stage2_training_reduces_loss(backbone, params, fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"], plus=True)
    bank = _extract(backbone, params, ds)
    state = create_train_state(backbone, params, learning_rate=5e-3)
    losses = []
    for epoch in range(8):
        state, mean_loss = train_epoch(
            backbone, state, bank,
            iter_train_bank(ds, 4, epoch_seed=epoch), impl="xla")
        losses.append(mean_loss)
    assert losses[-1] < losses[0], losses
    # frozen tower: visual params unchanged
    before = jax.tree_util.tree_leaves(params["params"]["visual"])
    after = jax.tree_util.tree_leaves(state.params["params"]["visual"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # text params did change
    tb = jax.tree_util.tree_leaves(params["params"]["text"])
    ta = jax.tree_util.tree_leaves(state.params["params"]["text"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(tb, ta))


def test_sampled_negative_variant_runs(backbone, params, fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    bank = _extract(backbone, params, ds)
    state = create_train_state(backbone, params, learning_rate=1e-3)
    state, loss = train_epoch(
        backbone, state, bank, iter_train_bank(ds, 4), impl="xla",
        neg_num=3, neg_rng=np.random.RandomState(0))
    assert np.isfinite(loss)


def test_fiq_validation_runs(backbone, params, fiq_root):
    metrics = fiq_val_retrieval(backbone, params, fiq_root, "dress", TF,
                                batch_size=4)
    assert set(metrics) == {"recall_at10", "recall_at50"}
    # 12-image gallery: recall@50 must be 100, recall@10 high
    assert metrics["recall_at50"] == 100.0


def test_cirr_validation_runs(backbone, params, cirr_root):
    metrics = cirr_val_retrieval(backbone, params, cirr_root, TF, batch_size=4)
    for k in ("recall_at1", "recall_at5", "group_recall_at1", "arithmetic_mean"):
        assert k in metrics
    assert metrics["recall_at50"] == 100.0  # 14-image gallery
    assert 0 <= metrics["group_recall_at1"] <= 100


def test_index_features_deterministic(backbone, params, fiq_root):
    ds = CIRDataset("fiq", "val", "classic", TF, fiq_root, ["dress"])
    i1 = extract_index_features(backbone, params, ds, 4, num_workers=0)
    i2 = extract_index_features(backbone, params, ds, 5, num_workers=2)
    assert i1.names == i2.names
    np.testing.assert_allclose(np.asarray(i1.target), np.asarray(i2.target), atol=1e-5)
    # clip eval parity: refer lookup is the RAW (unnormalized) encode
    norms = np.linalg.norm(i1.refer, axis=-1)
    assert not np.allclose(norms, 1.0)
