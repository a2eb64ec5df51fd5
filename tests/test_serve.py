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
