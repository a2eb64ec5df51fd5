"""CIRDataset semantics on synthetic fixtures (ref clip4cir/data_utils.py)."""

import json
import os

import numpy as np
import pytest

from spn4cir_tpu.data.datasets import (
    CIRDataset,
    iter_gallery,
    iter_relative_eval,
    iter_train_bank,
    iter_unique_images,
)
from spn4cir_tpu.data.transforms import ImageTransform
from tests.fixtures import make_cirr, make_fiq


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    return make_fiq(str(tmp_path_factory.mktemp("fiq")))


@pytest.fixture(scope="module")
def cirr_root(tmp_path_factory):
    return make_cirr(str(tmp_path_factory.mktemp("cirr")))


TF = ImageTransform("targetpad", 32)


def test_fiq_train_ids_and_modes(fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    assert len(ds) == 6
    assert ds.N == 6
    # id maps: insertion-ordered, refs before targets (ref :220-242)
    first = ds.triplets[0]
    assert ds.imagename2id[first["reference_name"]] == 0
    assert ds.targetname2id[first["target_name"]] == 0
    assert ds.num_unique_images == len(set(ds.imagename2id))
    # bank mode returns indices only
    ds.use_bank = True
    row = ds[0]
    assert isinstance(row[0], str) and row[1] == 0
    ds.use_bank = False
    img_row = ds[0]
    assert img_row[0].shape == (32, 32, 3)


def test_fiq_plus_extends_and_caption_boundary(fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"],
                    plus=True, seed=0)
    assert len(ds) == 12 and ds.N == 6
    # original triplets get the randomized two-caption combiner;
    # extended ones use random.choice over their variants (quirk §8.7)
    orig = {ds.caption_for(0, train=True) for _ in range(40)}
    assert any(" and " in c for c in orig)
    ext = {ds.caption_for(6, train=True) for _ in range(40)}
    assert ext <= {"ext 0 v1", "ext 0 v2"}


def test_fiq_llmcap(fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"],
                    plus=True, llmcap=True)
    assert ds.triplets[6]["captions"] == ["llm rewrite 0"]


def test_optimized_images_override(fiq_root, tmp_path):
    # copy fixture root and add a dedup map
    import shutil

    root = str(tmp_path / "fiq2")
    shutil.copytree(fiq_root, root)
    ds0 = CIRDataset("fiq", "train", "relative", TF, root, ["dress"])
    names = ds0.imagenames[:-1]  # pretend last is a duplicate of first
    paths = ds0.imagepaths[:-1]
    name2id = {n: i for i, n in enumerate(names)}
    name2id[ds0.imagenames[-1]] = 0
    with open(os.path.join(root, "optimized_images.json"), "w") as f:
        json.dump([names, paths, name2id], f)
    ds = CIRDataset("fiq", "train", "relative", TF, root, ["dress"])
    assert ds.num_unique_images == len(names)
    assert ds.imagename2id[ds0.imagenames[-1]] == 0


def test_cirr_layout_and_members(cirr_root):
    ds = CIRDataset("cirr", "train", "relative", TF, cirr_root)
    assert len(ds) == 6
    val = CIRDataset("cirr", "val", "relative", TF, cirr_root)
    name, target, caption, members = val[0]
    assert isinstance(caption, str) and len(members) == 4
    test1 = CIRDataset("cirr", "test1", "relative", TF, cirr_root)
    pairid, ref, cap, members = test1[0]
    assert pairid >= 90
    classic = CIRDataset("cirr", "val", "classic", TF, cirr_root)
    assert len(classic) == 14
    name, img = classic[0]
    assert img.shape == (32, 32, 3)


def test_cirr_extended_placeholders_dont_choke(cirr_root):
    ds = CIRDataset("cirr", "train", "relative", TF, cirr_root, plus=True)
    assert len(ds) == 12
    assert ds.triplets[-1]["group_members"] == ["xxx"]  # quirk §8.13
    # train iterator never touches members
    batches = list(iter_train_bank(ds, 4))
    assert len(batches) == 3


def test_iter_gallery_padding(fiq_root):
    ds = CIRDataset("fiq", "val", "classic", TF, fiq_root, ["dress"])
    batches = list(iter_gallery(ds, 5, num_workers=0))
    assert len(batches) == 3
    ids = np.concatenate([b[0] for b in batches])
    assert (ids >= 0).sum() == 12
    assert batches[-1][0][-1] == -1  # padded tail
    assert all(b[1].shape == (5, 32, 32, 3) for b in batches)


def test_iter_unique_images_covers_all(fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    seen = set()
    for ids, images in iter_unique_images(ds, 4, num_workers=0):
        seen.update(int(i) for i in ids if i >= 0)
    assert seen == set(range(ds.num_unique_images))


def test_iter_train_bank_shapes(fiq_root):
    ds = CIRDataset("fiq", "train", "relative", TF, fiq_root, ["dress"])
    batches = list(iter_train_bank(ds, 4, epoch_seed=1))
    assert len(batches) == 1  # drop_last: 6 -> 1x4
    b = batches[0]
    assert len(b["captions"]) == 4
    assert b["refer_image_id"].shape == (4,)
    # ids must be consistent with the dataset maps
    for j, ti in enumerate(b["triplet_idx"]):
        t = ds.triplets[int(ti)]
        assert b["target_image_id"][j] == ds.imagename2id[t["target_name"]]


def test_iter_relative_eval_ids(cirr_root):
    ds = CIRDataset("cirr", "val", "relative", TF, cirr_root)
    classic = CIRDataset("cirr", "val", "classic", TF, cirr_root)
    name2gid = {n: i for i, n in enumerate(classic.gallery_names)}
    for batch in iter_relative_eval(ds, 3):
        for j in range(len(batch["captions"])):
            assert batch["refer_gid"][j] in name2gid.values()
        assert batch["member_gids"].shape[1] == 4


def test_fiq_val_type_gallery(fiq_root):
    full = CIRDataset("fiq", "val", "classic", TF, fiq_root, ["dress"])
    val_only = CIRDataset("fiq", "val", "classic", TF, fiq_root, ["dress"],
                          fiq_val_type=1)
    assert len(val_only) <= len(full)
    rel = CIRDataset("fiq", "val", "relative", TF, fiq_root, ["dress"])
    needed = {t["reference_name"] for t in rel.triplets}
    needed |= {t["target_name"] for t in rel.triplets}
    assert set(val_only.gallery_names) == needed


def test_val_ret_train_mode(fiq_root):
    ds = CIRDataset("fiq", "val", "relative", TF, fiq_root, ["dress"],
                    val_ret_train=True)
    refer_img, caption, target_img = ds[0]
    assert refer_img.shape == (32, 32, 3)
    assert target_img.shape == (32, 32, 3)
    # deterministic "a and b" branch (type=0)
    assert " and " in caption


def test_train_caption_draws_are_resume_stateless(tmp_path):
    """Train-time caption randomization must be a pure function of
    (dataset seed, epoch_seed, triplet index): a resumed process that
    skips batches (start_step) or whole epochs replays the exact caption
    sequence of the uninterrupted run — the sequential-stream behavior
    diverged every post-resume draw (found via the SIGKILL resume test)."""
    from tests.fixtures import make_fiq
    from spn4cir_tpu.data.datasets import CIRDataset, iter_train_bank
    from spn4cir_tpu.data.transforms import ImageTransform

    root = make_fiq(str(tmp_path / "fashionIQ_dataset"), n_images=12,
                    n_train=8, extended=False)

    def caps(start_epoch=0, start_step=0, epochs=3):
        ds = CIRDataset("fiq", "train", "relative",
                        ImageTransform("targetpad", 32), root, ["dress"],
                        seed=7)
        out = []
        for e in range(start_epoch, epochs):
            ss = start_step if e == start_epoch else 0
            for raw in iter_train_bank(ds, 4, epoch_seed=7 + e,
                                       start_step=ss):
                out.append((e, tuple(raw["captions"])))
        return out

    full = caps()
    assert [c for c in full if c[0] >= 1] == caps(start_epoch=1)
    assert full[1:] == caps(start_step=1)
    # augmentation still varies across epochs
    assert any(full[i][1] != full[i + 2][1] for i in range(2))
