"""Retrieval service + HTTP front-end tests."""

import base64
import io
import json
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.eval.retrieval import extract_index_features
from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.serve import RetrievalService, serve
from tests.fixtures import make_fiq

TF = ImageTransform("targetpad", 32)


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    root = make_fiq(str(tmp_path_factory.mktemp("fiq")))
    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    classic = CIRDataset("fiq", "val", "classic", TF, root, ["dress"])
    index = extract_index_features(bb, params, classic, 4, num_workers=0)
    return RetrievalService(bb, params, index, preprocess=TF, default_k=5)


def test_query_by_name(service):
    name = service.index.names[0]
    results = service.query_by_name(name, "make it blue", k=3)
    assert len(results) == 3
    assert all(r["name"] != name for r in results)  # reference excluded
    assert results[0]["score"] >= results[-1]["score"]


def test_query_by_image(service, rng):
    img = Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8))
    results = service.query_by_image(img, "a red dress", k=4)
    assert len(results) == 4


def test_unknown_reference(service):
    with pytest.raises(KeyError):
        service.query_by_name("nope", "caption")


def test_http_server(service, rng):
    server = serve(service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["gallery_size"] == 12

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({"reference_name": service.index.names[1],
                             "caption": "shorter sleeves", "k": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 2

        # by image
        img = Image.fromarray(rng.randint(0, 256, (32, 32, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({
                "image_b64": base64.b64encode(buf.getvalue()).decode(),
                "caption": "blue", "k": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 2

        # errors
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({"caption": "no reference"}).encode())
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_batching_service_concurrent(service, tmp_path_factory):
    """Concurrent queries coalesce into batched dispatches and match the
    unbatched results."""
    import concurrent.futures

    from spn4cir_tpu.serve import BatchingRetrievalService

    batched = BatchingRetrievalService(
        service.backbone, service.params, service.index,
        preprocess=service.preprocess, default_k=4, max_batch=8,
        max_delay_s=0.02)
    names = service.index.names[:6]
    captions = [f"caption {i}" for i in range(6)]

    with concurrent.futures.ThreadPoolExecutor(6) as pool:
        futs = [pool.submit(batched.query_by_name, n, c)
                for n, c in zip(names, captions)]
        got = [f.result(timeout=180) for f in futs]
    for n, c, res in zip(names, captions, got):
        want = service.query_by_name(n, c, k=4)
        assert [r["name"] for r in res] == [w["name"] for w in want]

    with pytest.raises(KeyError):
        batched.query_by_name("nope", "x")
