"""End-to-end --device_preprocess paths: raw staging flows through the
iterators, bank extraction, gallery indexing, stage-1 steps, and serving,
with the resize/crop/normalize absorbed into the device jit
(ops/preprocess.py). Numeric resize parity itself is covered by
test_preprocess_device.py's tolerance ladder; these tests pin the plumbing:
RawBatch reaches every consumer and produces features equal to manually
staging + preprocessing on device, and close to the all-host pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spn4cir_tpu.data.datasets import CIRDataset, iter_gallery, iter_unique_images
from spn4cir_tpu.data.transforms import (ImageTransform, RawBatch,
                                         RawStageTransform)
from spn4cir_tpu.models.api import build_backbone
from tests.fixtures import make_fiq


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    return make_fiq(str(tmp_path_factory.mktemp("fiq_devpre")))


@pytest.fixture(scope="module")
def tiny():
    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    return bb, params


def _datasets(fiq_root, bb, canvas=64):
    host_tf = ImageTransform("targetpad", bb.input_dim)
    raw_tf = RawStageTransform("targetpad", bb.input_dim, canvas)
    host_ds = CIRDataset("fiq", "val", "classic", host_tf, fiq_root, ["dress"])
    raw_ds = CIRDataset("fiq", "val", "classic", raw_tf, fiq_root, ["dress"])
    return host_ds, raw_ds


def test_iter_gallery_yields_rawbatch(fiq_root, tiny):
    bb, _ = tiny
    _, raw_ds = _datasets(fiq_root, bb)
    ids, batch = next(iter_gallery(raw_ds, 4, num_workers=0))
    assert isinstance(batch, RawBatch)
    assert batch.canvas.dtype == np.uint8
    assert batch.canvas.shape == (4, 64, 64, 3)
    assert batch.extents.shape == (4, 2)
    # fixture images are 40x40 squares: targetpad is a no-op
    assert (batch.extents == 40).all()


def test_index_features_raw_matches_manual_and_host(fiq_root, tiny):
    from spn4cir_tpu.eval.retrieval import extract_index_features
    from spn4cir_tpu.ops.preprocess import preprocess_batch_dynamic

    bb, params = tiny
    host_ds, raw_ds = _datasets(fiq_root, bb)
    host = extract_index_features(bb, params, host_ds, 4, num_workers=0)
    raw = extract_index_features(bb, params, raw_ds, 4, num_workers=0)
    assert list(host.names) == list(raw.names)

    # plumbing: the raw path == manually staging + device preprocess
    ids, batch = next(iter_gallery(raw_ds, 4, num_workers=0))
    x = preprocess_batch_dynamic(jnp.asarray(batch.canvas),
                                 jnp.asarray(batch.extents),
                                 bb.input_dim, "targetpad")
    want = jax.device_get(
        jax.jit(lambda p, im: bb.index_features(p, im))(params, x))
    got = np.asarray(raw.target)[ids]
    np.testing.assert_allclose(got, want["target"], atol=1e-5, rtol=0)

    # resampler ladder: device features track the all-host pipeline
    cos = (np.asarray(host.target) * np.asarray(raw.target)).sum(-1)
    assert cos.min() > 0.99, float(cos.min())


def test_extract_banks_raw(fiq_root, tiny):
    from spn4cir_tpu.bank.bank import extract_banks
    from spn4cir_tpu.ops.preprocess import absorb_raw

    bb, params = tiny
    host_tf = ImageTransform("targetpad", bb.input_dim)
    raw_tf = RawStageTransform("targetpad", bb.input_dim, 64)
    host_ds = CIRDataset("fiq", "train", "relative", host_tf, fiq_root,
                         ["dress"])
    raw_ds = CIRDataset("fiq", "train", "relative", raw_tf, fiq_root,
                        ["dress"])

    plain = jax.jit(lambda imgs: bb.bank_features(params, imgs))
    absorbed = jax.jit(
        lambda imgs: absorb_raw(
            lambda p, im: bb.bank_features(p, im),
            bb.input_dim, "targetpad")(params, imgs))
    host_bank = extract_banks(plain, iter_unique_images(host_ds, 4, 0),
                              host_ds.num_unique_images)
    raw_bank = extract_banks(absorbed, iter_unique_images(raw_ds, 4, 0),
                             raw_ds.num_unique_images)
    cos = (np.asarray(host_bank.target) * np.asarray(raw_bank.target)).sum(-1)
    assert cos.min() > 0.99, float(cos.min())


def test_stage1_step_raw_close_to_host(fiq_root, tiny):
    from spn4cir_tpu.data.datasets import iter_train_images
    from spn4cir_tpu.train.stage1 import (create_stage1_state,
                                          stage1_train_step)

    bb, params = tiny
    host_tf = ImageTransform("targetpad", bb.input_dim)
    raw_tf = RawStageTransform("targetpad", bb.input_dim, 64)
    host_ds = CIRDataset("fiq", "train", "relative", host_tf, fiq_root,
                         ["dress"], seed=1)
    raw_ds = CIRDataset("fiq", "train", "relative", raw_tf, fiq_root,
                        ["dress"], seed=1)

    def one_step(ds, raw_kind):
        batch_raw = next(iter_train_images(ds, 4, num_workers=0))
        to_dev = (jnp.asarray if raw_kind is None
                  else lambda rb: RawBatch(jnp.asarray(rb.canvas),
                                           jnp.asarray(rb.extents)))
        batch = {
            "refer_images": to_dev(batch_raw["refer_images"]),
            "target_images": to_dev(batch_raw["target_images"]),
            "text_ids": jnp.asarray(bb.tokenize(batch_raw["captions"])),
        }
        state = create_stage1_state(bb, params, 1e-5)
        state, loss = stage1_train_step(bb, state, batch, 0, None, raw_kind)
        return float(loss)

    host_loss = one_step(host_ds, None)
    raw_loss = one_step(raw_ds, "targetpad")
    assert np.isfinite(raw_loss)
    assert abs(host_loss - raw_loss) < 0.05, (host_loss, raw_loss)


def test_service_raw_query_and_add(fiq_root, tiny):
    from PIL import Image

    from spn4cir_tpu.eval.retrieval import extract_index_features
    from spn4cir_tpu.serve.service import RetrievalService

    bb, params = tiny
    _, raw_ds = _datasets(fiq_root, bb)
    raw_tf = raw_ds.preprocess
    index = extract_index_features(bb, params, raw_ds, 4, num_workers=0)
    svc = RetrievalService(bb, params, index, preprocess=raw_tf)

    rng = np.random.RandomState(3)
    im = Image.fromarray(rng.randint(0, 256, (50, 44, 3), dtype=np.uint8))
    hits = svc.query_by_image(im, "make it red", k=3)
    assert len(hits) == 3 and all("name" in h for h in hits)

    n0 = len(svc.index.names)
    new = svc.add_images(["new_a", "new_b"],
                         [im, Image.fromarray(rng.randint(
                             0, 256, (40, 40, 3), dtype=np.uint8))])
    assert new == n0 + 2
    # the freshly added image must be retrievable by name
    hits = svc.query_by_name("new_a", "same but blue", k=2)
    assert len(hits) == 2
