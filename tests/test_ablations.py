"""Ablation paths: stage-1 (wo_bank), negtype bitmask loss, unlabeled-bank
extension (negplus) — ref clip4cir/train_negtype.py / train_negplus.py."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.bank.bank import extend_target_bank, extract_banks, extract_unlabeled_features
from spn4cir_tpu.data.datasets import (
    CIRDataset,
    iter_train_images,
    iter_unique_images,
    iter_unlabeled,
)
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.train.stage1 import create_stage1_state, train_epoch_stage1
from tests.fixtures import make_fiq

TF = ImageTransform("targetpad", 32)


@pytest.fixture(scope="module")
def bb():
    return build_backbone("clip", clip_model_name="test-tiny", tau=0.05)


@pytest.fixture(scope="module")
def params(bb):
    return bb.init_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    # fixture where some split images appear in no triplet -> unlabeled pool
    return make_fiq(str(tmp_path_factory.mktemp("fiq")), n_images=12, n_train=4)


def test_stage1_training_runs(bb, params, fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    state = create_stage1_state(bb, params, 1e-3)
    state, loss = train_epoch_stage1(
        bb, state, iter_train_images(ds, 4, num_workers=0, shuffle=True))
    assert np.isfinite(loss)
    # stage 1 trains the vision tower too
    before = np.asarray(jax.tree_util.tree_leaves(params["params"]["visual"])[0])
    after = np.asarray(jax.tree_util.tree_leaves(state.params["params"]["visual"])[0])
    assert not np.array_equal(before, after)


@pytest.mark.parametrize("neg_type", [1, 2, 4, 8, 15])
def test_negtype_training_runs(bb, params, fiq_root, neg_type):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    state = create_stage1_state(bb, params, 1e-3)
    state, loss = train_epoch_stage1(
        bb, state, iter_train_images(ds, 4, num_workers=0),
        neg_type=neg_type)
    assert np.isfinite(loss)


def test_unlabeled_pool_and_bank_extension(bb, params, fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    unl = CIRDataset("fiq", "train", "unlabeled", TF, fiq_root, ["dress"])
    # with 12 split images and only 4 triplets, some images are unlabeled
    assert len(unl.unlabeled_imagepaths) > 0
    assert len(unl.unlabeled_imagepaths) == 12 - ds.num_unique_images

    fn = jax.jit(lambda imgs: bb.bank_features(params, imgs))
    bank = extract_banks(fn, iter_unique_images(ds, 4, num_workers=0),
                         ds.num_unique_images)
    enc = jax.jit(lambda imgs: bb.gallery_features(params, imgs))
    extra = extract_unlabeled_features(
        enc, iter_unlabeled(unl, 4, num_workers=0),
        len(unl.unlabeled_imagepaths))
    extended = extend_target_bank(bank, extra)
    assert extended.target.shape[0] == bank.target.shape[0] + extra.shape[0]
    # positives keep their original ids (first rows unchanged)
    np.testing.assert_array_equal(
        np.asarray(extended.target[: bank.target.shape[0]]),
        np.asarray(bank.target))
    # neg_num truncation
    trimmed = extend_target_bank(bank, extra, neg_num=1)
    assert trimmed.target.shape[0] == bank.target.shape[0] + 1


def test_negtype_cli_wrapper(fiq_root, tmp_path, monkeypatch):
    from spn4cir_tpu.cli.train import train_main

    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--wo_bank", "--neg_type", "5",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0


def test_unlabeled_cli(fiq_root, tmp_path, monkeypatch):
    from spn4cir_tpu.cli.train import train_main

    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--unlabeled", "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0
    assert os.path.exists(tmp_path / "out" / "fiq_bank_unlabeled.npz")
