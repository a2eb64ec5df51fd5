"""Sharded (multi-chip) serving: exact equality vs the single-chip service.

Runs on the 8-device virtual CPU mesh (conftest). The distributed top-k
must return the identical ranked results — names AND scores — as
`RetrievalService` on the same gallery, including the reference-exclusion
mask and galleries whose size does not divide the shard count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.eval.retrieval import extract_index_features
from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.parallel.mesh import make_mesh
from spn4cir_tpu.serve import (
    RetrievalService, ShardedGalleryIndex, ShardedRetrievalService)
from tests.fixtures import make_fiq

TF = ImageTransform("targetpad", 32)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """(single-chip service, sharded service) on the SAME gallery."""
    root = make_fiq(str(tmp_path_factory.mktemp("fiq")))
    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    classic = CIRDataset("fiq", "val", "classic", TF, root, ["dress"])
    index = extract_index_features(bb, params, classic, 4, num_workers=0)
    mesh = make_mesh(data=1, bank=len(jax.devices()))
    single = RetrievalService(bb, params, index, preprocess=TF, default_k=5)
    sharded = ShardedRetrievalService(bb, params, index, mesh,
                                     preprocess=TF, default_k=5)
    return single, sharded


def test_gallery_not_divisible_is_padded(pair):
    _, sharded = pair
    n = sharded.mesh.shape["bank"]
    m = len(sharded.index.names)
    assert sharded.index.target.shape[0] % n == 0
    assert sharded.index.target.shape[0] >= m


def test_query_equality(pair):
    single, sharded = pair
    for name in single.index.names[:3]:
        for caption in ["make it blue", "longer sleeves"]:
            want = single.query_by_name(name, caption, k=4)
            got = sharded.query_by_name(name, caption, k=4)
            assert [r["name"] for r in got] == [r["name"] for r in want]
            np.testing.assert_allclose(
                [r["score"] for r in got], [r["score"] for r in want],
                rtol=1e-6, atol=1e-6)
            assert all(r["name"] != name for r in got)  # exclusion mask


def test_query_k_exceeds_local_shard(pair):
    """k larger than any single shard's row count: the merge must still
    recover the exact global order (fixture gallery / 8 shards -> 1-2 rows
    per shard)."""
    single, sharded = pair
    m = len(single.index.names)
    name = single.index.names[1]
    want = single.query_by_name(name, "swap the color", k=m - 1)
    got = sharded.query_by_name(name, "swap the color", k=m - 1)
    assert [r["name"] for r in got] == [r["name"] for r in want]


def test_query_by_image_equality(pair, rng):
    single, sharded = pair
    img = Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8))
    want = single.query_by_image(img, "a red dress", k=4)
    got = sharded.query_by_image(img, "a red dress", k=4)
    assert [r["name"] for r in got] == [r["name"] for r in want]


def test_add_images_resards_and_matches(pair, rng):
    single, sharded = pair
    bb, params = sharded.backbone, sharded.params
    index0 = single.index
    # fresh copies so the module-scoped fixture isn't mutated for others
    import copy

    s1 = RetrievalService(bb, params, copy.copy(index0), preprocess=TF,
                          default_k=5)
    s2 = ShardedRetrievalService(bb, params, copy.copy(index0), sharded.mesh,
                                 preprocess=TF, default_k=5)
    imgs = [Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8))
            for _ in range(3)]
    names = [f"new_{i}" for i in range(3)]
    size1 = s1.add_images(names, imgs)
    size2 = s2.add_images(names, imgs)
    assert size1 == size2 == len(index0.names) + 3
    n = s2.mesh.shape["bank"]
    assert s2.index.target.shape[0] % n == 0
    ref = s1.index.names[0]
    want = s1.query_by_name(ref, "something new", k=6)
    got = s2.query_by_name(ref, "something new", k=6)
    assert [r["name"] for r in got] == [r["name"] for r in want]
    with pytest.raises(KeyError):
        s2.add_images(["new_0"], imgs[:1])


def test_sharded_index_roundtrip(pair):
    """from_index keeps names/refer and reconstructs the dense rows."""
    single, sharded = pair
    idx = sharded.index
    assert isinstance(idx, ShardedGalleryIndex)
    assert idx.names == single.index.names
    np.testing.assert_array_equal(idx.host_target,
                                  np.asarray(single.index.target))
    m = len(idx.names)
    np.testing.assert_allclose(
        np.asarray(idx.target)[:m], idx.host_target, rtol=1e-6, atol=1e-6)


def test_sharded_batching_coalesces_and_matches(pair):
    """Micro-batching composes with the sharded gallery: concurrent queries
    coalesce into distributed dispatches with unchanged results."""
    import concurrent.futures

    from spn4cir_tpu.serve import ShardedBatchingRetrievalService

    single, sharded = pair
    svc = ShardedBatchingRetrievalService(
        sharded.backbone, sharded.params, single.index, sharded.mesh,
        preprocess=TF, default_k=5, max_batch=8, max_delay_s=0.05)
    names = single.index.names[:6]
    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        futs = {n: ex.submit(svc.query_by_name, n, "brighter", 3)
                for n in names}
    for n, fut in futs.items():
        want = single.query_by_name(n, "brighter", k=3)
        assert [r["name"] for r in fut.result()] == \
               [r["name"] for r in want]
    assert svc._batches_dispatched < len(names)  # actually coalesced


def test_serve_cli_sharded(tmp_path, rng):
    """The serving CLI launcher: index a fixture gallery, stand up the HTTP
    server with a sharded gallery + micro-batching, query it."""
    import json
    import urllib.request

    from spn4cir_tpu.cli.serve import serve_main

    root = make_fiq(str(tmp_path / "fiq"))
    server, service = serve_main(
        "clip",
        argv=["--dataset", "fiq", "--data_path", root,
              "--clip-model-name", "test-tiny", "--batch-size", "4",
              "--dress_types", "dress", "--mesh_bank",
              str(len(jax.devices())), "--serve_batch", "4",
              "--serve_host", "127.0.0.1", "--serve_port", "0",
              "--no-block"])
    try:
        port = server.server_address[1]
        name = service.index.names[0]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({"reference_name": name,
                             "caption": "make it red", "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        results = json.loads(
            urllib.request.urlopen(req, timeout=60).read())["results"]
        assert len(results) == 3
        assert all(r["name"] != name for r in results)
    finally:
        server.shutdown()


def test_int8_gallery_matches_dequant_oracle(pair):
    """int8 serving: scoring the QuantBank gallery (dequant fused after the
    matmul) equals scoring its dequantized dense form — single-chip AND
    sharded return identical ranked results, and add_images re-quantizes
    per row exactly."""
    from spn4cir_tpu.eval.retrieval import GalleryIndex
    from spn4cir_tpu.ops.bank_kernels import quantize_bank

    single, sharded = pair
    bb, params = single.backbone, single.params
    qbank = quantize_bank(single.index.target)
    q_index = GalleryIndex(target=qbank, refer=single.index.refer,
                           names=single.index.names)
    oracle_index = GalleryIndex(target=qbank.dequantize(),
                                refer=single.index.refer,
                                names=single.index.names)
    svc_q = RetrievalService(bb, params, q_index, preprocess=TF, default_k=5)
    svc_o = RetrievalService(bb, params, oracle_index, preprocess=TF,
                             default_k=5)
    svc_qs = ShardedRetrievalService(bb, params, q_index, sharded.mesh,
                                     preprocess=TF, default_k=5)
    for name in single.index.names[:3]:
        want = svc_o.query_by_name(name, "make it blue", k=4)
        got = svc_q.query_by_name(name, "make it blue", k=4)
        got_s = svc_qs.query_by_name(name, "make it blue", k=4)
        assert [r["name"] for r in got] == [r["name"] for r in want]
        assert [r["name"] for r in got_s] == [r["name"] for r in want]
        np.testing.assert_allclose(
            [r["score"] for r in got], [r["score"] for r in want],
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            [r["score"] for r in got_s], [r["score"] for r in want],
            rtol=1e-5, atol=1e-5)

    # memory claim: the resident gallery really is int8 + one f32 scale/row
    assert svc_qs.index.target.values.dtype == jnp.int8

    # add_images: per-row quantization makes grow-then-query exact vs a
    # gallery quantized whole
    rng = np.random.RandomState(7)
    imgs = np.stack([np.asarray(TF(
        __import__("PIL.Image", fromlist=["Image"]).fromarray(
            rng.randint(0, 256, (40, 40, 3), dtype=np.uint8))))
        for _ in range(2)])
    n1 = svc_q.add_images(["q_new_0", "q_new_1"], imgs)
    n2 = svc_qs.add_images(["q_new_0", "q_new_1"], imgs)
    assert n1 == n2 == len(single.index.names) + 2
    ref = single.index.names[0]
    got = svc_q.query_by_name(ref, "a fresh look", k=6)
    got_s = svc_qs.query_by_name(ref, "a fresh look", k=6)
    assert [r["name"] for r in got_s] == [r["name"] for r in got]


def test_gallery_index_save_load_roundtrip(pair, tmp_path):
    from spn4cir_tpu.eval.retrieval import GalleryIndex
    from spn4cir_tpu.ops.bank_kernels import QuantBank, quantize_bank

    single, _ = pair
    # dense
    p = str(tmp_path / "idx")
    single.index.save(p)
    loaded = GalleryIndex.load(p)
    assert loaded.names == single.index.names
    np.testing.assert_array_equal(np.asarray(loaded.target),
                                  np.asarray(single.index.target))
    np.testing.assert_array_equal(loaded.refer, single.index.refer)
    # int8
    q = GalleryIndex(target=quantize_bank(single.index.target),
                     refer=single.index.refer, names=single.index.names)
    pq = str(tmp_path / "idx_q8")
    q.save(pq)
    lq = GalleryIndex.load(pq)
    assert isinstance(lq.target, QuantBank)
    np.testing.assert_array_equal(np.asarray(lq.target.values),
                                  np.asarray(q.target.values))
    np.testing.assert_array_equal(np.asarray(lq.target.scales),
                                  np.asarray(q.target.scales))


def test_serve_cli_index_cache_and_metrics(tmp_path, rng):
    """Second launch loads the cached index instead of re-encoding; the
    /metrics endpoint reports query counters."""
    import json
    import urllib.request

    from spn4cir_tpu.cli.serve import serve_main

    root = make_fiq(str(tmp_path / "fiq"))
    cache = str(tmp_path / "gallery_idx")
    argv = ["--dataset", "fiq", "--data_path", root,
            "--clip-model-name", "test-tiny", "--batch-size", "4",
            "--dress_types", "dress", "--index_cache", cache,
            "--gallery_dtype", "int8",
            "--serve_host", "127.0.0.1", "--serve_port", "0", "--no-block"]
    server1, svc1 = serve_main("clip", argv=argv)
    server1.shutdown()
    import os

    assert os.path.exists(cache + ".npz")

    server2, svc2 = serve_main("clip", argv=argv)  # cache-load path
    try:
        from spn4cir_tpu.ops.bank_kernels import QuantBank

        assert isinstance(svc2.index.target, QuantBank)  # dtype survives
        assert svc2.index.names == svc1.index.names
        port = server2.server_address[1]
        name = svc2.index.names[0]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({"reference_name": name,
                             "caption": "shinier", "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=60).read()
        m = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=60).read())
        assert m["queries"] == 1 and m["dispatches"] == 1
        assert m["gallery_dtype"] == "int8"
        assert m["latency_ms_avg"] > 0
    finally:
        server2.shutdown()


def test_int8_maxquery_scores_match_oracle(rng):
    """3-D (M, Q, D) quant gallery: max-over-query scoring with per-(m,q)
    scales equals the dequantized oracle."""
    from spn4cir_tpu.ops import infonce
    from spn4cir_tpu.ops.bank_kernels import quantize_bank
    from spn4cir_tpu.serve.service import quantized_score_queries

    gallery = jnp.asarray(rng.standard_normal((11, 4, 8)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    qbank = quantize_bank(gallery)
    got = quantized_score_queries(queries, qbank)
    want = infonce.max_query_scores(queries, qbank.dequantize())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_maxquery_gallery_shards(pair):
    """3-D (M, Q, D) galleries (blip2 max-over-query) shard row-wise and
    score identically through the distributed top-k."""
    from spn4cir_tpu.ops import infonce

    class FakeMQBackbone:
        def score_queries(self, q, gallery):
            return infonce.max_query_scores(q, gallery)

    rng = np.random.RandomState(3)
    m, q_tok, d = 13, 4, 8
    gallery = jnp.asarray(rng.standard_normal((m, q_tok, d)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((2, d)), jnp.float32)

    mesh = make_mesh(data=1, bank=len(jax.devices()))
    svc = ShardedRetrievalService.__new__(ShardedRetrievalService)
    svc.mesh = mesh
    svc._scorer_cache = {}
    svc.backbone = FakeMQBackbone()
    idx = ShardedGalleryIndex.from_arrays(
        np.asarray(gallery), np.zeros((m, d), np.float32),
        [f"g{i}" for i in range(m)], mesh)

    gids = np.asarray([0, -1])
    vals, ids = svc._score_topk(idx, queries, gids, 5)
    scores = np.array(infonce.max_query_scores(queries, gallery))
    scores[0, 0] = -np.inf  # exclusion
    order = np.argsort(-scores, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(ids), order)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(scores, order, axis=1),
        rtol=1e-6, atol=1e-6)
