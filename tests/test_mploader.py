"""Multi-process loader: in-order delivery, PIL-transform parity, recycling.

The worker processes build/load the native .so themselves and fall back to
the PIL path where unavailable — either way the yielded arrays must match
mapping ImageTransform over the same paths in the same order."""

import numpy as np
import pytest
from PIL import Image

from spn4cir_tpu.data.mploader import MPLoader, batched_paths
from spn4cir_tpu.data.transforms import ImageTransform
from tests.fixtures import make_fiq


@pytest.fixture(scope="module")
def image_paths(tmp_path_factory):
    root = make_fiq(str(tmp_path_factory.mktemp("mp") / "fashionIQ_dataset"),
                    n_images=10)
    import glob
    import os

    paths = sorted(glob.glob(os.path.join(root, "images", "*.png")))
    assert len(paths) >= 10
    return paths


def test_mploader_order_and_parity(image_paths):
    tf = ImageTransform("targetpad", 32)
    want = np.stack([np.asarray(tf(Image.open(p))) for p in image_paths])

    with MPLoader("targetpad", 32, batch_size=4, num_procs=2,
                  threads_per_proc=1) as loader:
        got = []
        for arr, n in loader.map_batches(batched_paths(image_paths, 4)):
            got.append(arr[:n].copy())  # views are recycled next iteration
    got = np.concatenate(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_mploader_many_batches_recycle(image_paths):
    """More batches than shared-memory blocks: the free-list recycles."""
    batches = batched_paths(image_paths * 3, 4)  # 8 batches > 2*2+2 blocks
    with MPLoader("clip", 32, batch_size=4, num_procs=2,
                  threads_per_proc=1) as loader:
        total = sum(n for _, n in loader.map_batches(batches))
    assert total == len(image_paths) * 3


def test_mploader_error_propagates(image_paths):
    with MPLoader("clip", 32, batch_size=2, num_procs=1,
                  threads_per_proc=1) as loader:
        with pytest.raises(IOError):
            for _ in loader.map_batches([[image_paths[0], "/nonexistent.png"]]):
                pass


def test_iter_gallery_mp_env_matches_default(image_paths, tmp_path, monkeypatch):
    """SPN4CIR_MP_PROCS routes the gallery scan through the multi-process
    loader; (ids, images) must match the default thread-pool path."""
    import os

    from spn4cir_tpu.data.datasets import CIRDataset, iter_gallery

    root = os.path.dirname(os.path.dirname(image_paths[0]))
    ds = CIRDataset("fiq", "val", "classic", ImageTransform("targetpad", 32),
                    root, ["dress"])
    want = list(iter_gallery(ds, 4, num_workers=2))
    monkeypatch.setenv("SPN4CIR_MP_PROCS", "2")
    got = list(iter_gallery(ds, 4, num_workers=2))
    assert len(got) == len(want)
    for (ia, a), (ib, b) in zip(want, got):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(a, b, atol=2e-2)


def test_iter_train_images_mp_env_matches_default(image_paths, tmp_path,
                                                  monkeypatch):
    """SPN4CIR_MP_PROCS routes stage-1's per-step decode (iter_train_images:
    refer block + target block in one 2B-row loader batch) through the
    multi-process loader; every batch field must match the thread path,
    including the epoch-seeded caption randomization and the padded tail."""
    import os

    from spn4cir_tpu.data.datasets import CIRDataset, iter_train_images

    root = os.path.dirname(os.path.dirname(image_paths[0]))
    ds = CIRDataset("fiq", "train", "relative",
                    ImageTransform("targetpad", 32), root, ["dress"])
    want = list(iter_train_images(ds, 4, shuffle=True, epoch_seed=3,
                                  num_workers=2))
    monkeypatch.setenv("SPN4CIR_MP_PROCS", "2")
    got = list(iter_train_images(ds, 4, shuffle=True, epoch_seed=3,
                                 num_workers=2))
    assert len(got) == len(want) and len(want) > 0
    for a, b in zip(want, got):
        assert a["captions"] == b["captions"]
        for key in ("triplet_idx", "target_id", "target_image_id",
                    "refer_image_id"):
            np.testing.assert_array_equal(a[key], b[key])
        np.testing.assert_allclose(a["refer_images"], b["refer_images"],
                                   atol=2e-2)
        np.testing.assert_allclose(a["target_images"], b["target_images"],
                                   atol=2e-2)


def test_mploader_raw_mode(image_paths):
    """raw_canvas mode: uint8 canvases + extents, order-preserving, matching
    direct staging of the same paths."""
    from spn4cir_tpu.data.transforms import RawBatch, stage_raw_image

    with MPLoader("targetpad", 32, batch_size=4, num_procs=2,
                  threads_per_proc=1, raw_canvas=64) as loader:
        got_c, got_e, ns = [], [], []
        for batch, n in loader.map_batches(batched_paths(image_paths, 4)):
            assert isinstance(batch, RawBatch)
            assert batch.canvas.dtype == np.uint8
            got_c.append(batch.canvas[:n].copy())
            got_e.append(batch.extents[:n].copy())
            ns.append(n)
    got_c = np.concatenate(got_c)
    got_e = np.concatenate(got_e)
    assert got_c.shape == (len(image_paths), 64, 64, 3)
    for i, p in enumerate(image_paths):
        arr = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        want, ext = stage_raw_image(arr, 64, "targetpad")
        np.testing.assert_array_equal(got_c[i], want, err_msg=p)
        assert tuple(got_e[i]) == ext


def test_iter_gallery_mp_raw_matches_default(image_paths, monkeypatch):
    """SPN4CIR_MP_PROCS + RawStageTransform: the raw-staging gallery scan
    through the MP loader must yield the same canvases/extents as the
    in-process thread path (native staging is deterministic)."""
    import os

    from spn4cir_tpu.data.datasets import CIRDataset, iter_gallery
    from spn4cir_tpu.data.transforms import RawStageTransform

    root = os.path.dirname(os.path.dirname(image_paths[0]))
    ds = CIRDataset("fiq", "val", "classic",
                    RawStageTransform("targetpad", 32, 64), root, ["dress"])
    want = list(iter_gallery(ds, 4, num_workers=2))
    monkeypatch.setenv("SPN4CIR_MP_PROCS", "2")
    got = list(iter_gallery(ds, 4, num_workers=2))
    assert len(got) == len(want) and len(want) > 0
    for (ia, a), (ib, b) in zip(want, got):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(a.canvas, b.canvas)
        np.testing.assert_array_equal(a.extents, b.extents)


def test_iter_train_images_mp_raw(image_paths, monkeypatch):
    """stage-1's 2B-row MP decode in raw mode: refer/target RawBatch halves
    match the thread path bit-exactly."""
    import os

    from spn4cir_tpu.data.datasets import CIRDataset, iter_train_images
    from spn4cir_tpu.data.transforms import RawStageTransform

    root = os.path.dirname(os.path.dirname(image_paths[0]))
    ds = CIRDataset("fiq", "train", "relative",
                    RawStageTransform("targetpad", 32, 64), root, ["dress"])
    want = list(iter_train_images(ds, 4, shuffle=True, epoch_seed=3,
                                  num_workers=2))
    monkeypatch.setenv("SPN4CIR_MP_PROCS", "2")
    got = list(iter_train_images(ds, 4, shuffle=True, epoch_seed=3,
                                 num_workers=2))
    assert len(got) == len(want) and len(want) > 0
    for a, b in zip(want, got):
        assert a["captions"] == b["captions"]
        for side in ("refer_images", "target_images"):
            np.testing.assert_array_equal(a[side].canvas, b[side].canvas)
            np.testing.assert_array_equal(a[side].extents, b[side].extents)
