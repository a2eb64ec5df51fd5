"""MLLM captioning service (serve/mllm.py): coalescing, prompt routing,
HTTP endpoints, CLI launcher."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image


def _png_b64(rng, size=16):
    img = Image.fromarray(
        (rng.standard_normal((size, size, 3)) * 40 + 128).clip(0, 255)
        .astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def tiny_service():
    """CaptionService over the tiny random LLaVA captioner."""
    from spn4cir_tpu.datagen.captioner import make_llava_captioner
    from spn4cir_tpu.serve.mllm import CaptionService

    _, transform, batched_fn = make_llava_captioner(
        None, llava_size="tiny", batch_size=2, max_new_tokens=6)
    return CaptionService(batched_fn, transform, model_name="llava",
                          max_batch=2, max_delay_s=0.01,
                          default_prompt="describe the image in 5 words")


def test_caption_service_basic(tiny_service, rng):
    img = Image.fromarray(
        (rng.standard_normal((16, 16, 3)) * 40 + 128).clip(0, 255)
        .astype(np.uint8))
    caps = tiny_service.caption([img, img])
    assert len(caps) == 2
    assert all(isinstance(c, str) for c in caps)
    m = tiny_service.metrics()
    assert m["images"] >= 2 and m["batches_dispatched"] >= 1


def test_caption_service_concurrent_coalesce(tiny_service, rng):
    """Two single-image requests arriving together ride one dispatch."""
    img = Image.fromarray(
        (rng.standard_normal((16, 16, 3)) * 40 + 128).clip(0, 255)
        .astype(np.uint8))
    tiny_service.caption([img])  # warm the jit so both threads enqueue fast
    before = tiny_service.metrics()["batches_dispatched"]
    results = {}

    def worker(i):
        results[i] = tiny_service.caption([img])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 2
    after = tiny_service.metrics()["batches_dispatched"]
    # same prompt, coalescing window 10 ms: typically 1 dispatch, never >2
    assert after - before <= 2


def test_caption_http_endpoints(tiny_service, rng):
    from spn4cir_tpu.serve.mllm import serve_captions

    server = serve_captions(tiny_service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["model"] == "llava"
        body = json.dumps({"image_b64": _png_b64(rng)}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert isinstance(out["caption"], str)
        # batch form + prompt override
        body = json.dumps({"images_b64": [_png_b64(rng), _png_b64(rng)],
                           "prompt": "what color is the dress"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert len(out["captions"]) == 2
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics") as r:
            assert json.load(r)["requests"] >= 2
    finally:
        server.shutdown()


def test_caption_prompt_rejected_when_unsupported(rng):
    """A prompt against a no-prompt backend 400s without poisoning the
    batch (the BLIP batched_fn takes no prompt kwarg)."""
    from spn4cir_tpu.serve.mllm import CaptionService, serve_captions

    def batched_fn(images):  # BLIP-shaped: no prompt parameter
        return ["a picture"] * len(images)

    svc = CaptionService(batched_fn, lambda im: np.asarray(im),
                         model_name="blip", max_batch=2, max_delay_s=0.001,
                         supports_prompt=False)
    server = serve_captions(svc, host="127.0.0.1", port=0)
    try:
        port = server.server_address[1]
        body = json.dumps({"image_b64": _png_b64(rng),
                           "prompt": "nope"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req)
        assert exc_info.value.code == 400
        # prompt-less requests still work
        body = json.dumps({"image_b64": _png_b64(rng)}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["caption"] == "a picture"
    finally:
        server.shutdown()


def test_caption_group_failure_isolated(rng):
    """One prompt group's failure must not clobber another group's
    delivered results in the same coalesced batch."""
    from spn4cir_tpu.serve.mllm import CaptionService

    def batched_fn(images, prompt=None):
        if prompt == "bad":
            raise RuntimeError("boom")
        return ["ok"] * len(images)

    svc = CaptionService(batched_fn, lambda im: np.asarray(im),
                         max_batch=4, max_delay_s=0.05)
    img = np.zeros((4, 4, 3), np.uint8)
    results = {}

    def good():
        results["good"] = svc.caption([img], "fine")

    def bad():
        try:
            svc.caption([img], "bad")
        except RuntimeError as exc:
            results["bad"] = str(exc)

    threads = [threading.Thread(target=good), threading.Thread(target=bad)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["good"] == ["ok"]
    assert results["bad"] == "boom"


def test_serve_mllm_cli_tiny():
    from spn4cir_tpu.cli.serve_mllm import main

    server, service = main(["--mllm", "llava", "--llava_size", "tiny",
                            "--batch_size", "2", "--max_new_tokens", "4",
                            "--port", "0", "--host", "127.0.0.1",
                            "--no-block"])
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
    finally:
        server.shutdown()
