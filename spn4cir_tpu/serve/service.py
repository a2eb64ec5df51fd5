"""CIR retrieval serving: an in-process service + HTTP front-end.

The reference vendors LLaVA's controller/worker REST stack for MLLM serving
(`zscir/llava/serve/`, SURVEY.md §2.6) but has no serving path for the CIR
product itself; this module provides one, TPU-native: a pre-encoded gallery
index held in device HBM, a jitted fuse+score+top-k query path, and a
threaded HTTP server (stdlib only) for deployment.

Query forms:
  - reference by gallery name (the CIR eval convention, quirk SURVEY.md §8.8:
    reference features come from the gallery index)
  - reference by image (base64-encoded), encoded on the fly
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.eval.retrieval import GalleryIndex
from spn4cir_tpu.models.api import CIRBackbone


def _mask_rows(scores: jnp.ndarray, gids: jnp.ndarray) -> jnp.ndarray:
    """Set scores[i, gids[i]] = -inf; gid -1 masks nothing for that row."""
    rows = jnp.arange(scores.shape[0])
    safe = jnp.clip(gids, 0, scores.shape[1] - 1)
    masked = scores.at[rows, safe].set(-jnp.inf)
    return jnp.where((gids >= 0)[:, None], masked, scores)


def _round_up_k(k: int) -> int:
    """Bucket k so the jitted top-k specializes on a few sizes only."""
    n = 16
    while n < k:
        n *= 2
    return n


def quantized_score_queries(queries, qbank) -> jnp.ndarray:
    """Score against an int8 `QuantBank` gallery with dequant AFTER the
    matmul: HBM reads stay int8 (4x the gallery per chip) and the
    int8->f32 convert fuses into the matmul operand read. Exactly equals
    scoring the dequantized gallery (per-row scales factor out of the
    feature-axis contraction). Flat (M, D) -> cosine dot; 3-D (M, Q, D) ->
    blip2 max-over-query (`infonce.max_query_scores`)."""
    q = queries.astype(jnp.float32)
    if qbank.ndim == 3:
        sims = jnp.einsum("bd,mqd->bmq", q, qbank.values.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        return jnp.max(sims * qbank.scales[None], axis=-1)
    scores = jnp.dot(q, qbank.values.T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return scores * qbank.scales[None, :]


def _is_quant(target) -> bool:
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    return isinstance(target, QuantBank)


class RetrievalService:
    """Composed-image-retrieval queries against a fixed gallery index."""

    def __init__(self, backbone: CIRBackbone, params, index: GalleryIndex,
                 preprocess=None, default_k: int = 10):
        self.backbone = backbone
        self.params = params
        self.index = index
        self.preprocess = preprocess
        self.default_k = default_k
        self._name2gid = {n: i for i, n in enumerate(index.names)}
        self._fuse = jax.jit(
            lambda refer, text: backbone.fuse(params, refer, text))
        self._encode_refer = jax.jit(
            lambda imgs: backbone.index_features(params, imgs)["refer"])
        # --device_preprocess serving: the host stages raw uint8 canvases
        # and resize/crop/normalize fuse with the encoder on-device
        from spn4cir_tpu.data.transforms import RawStageTransform

        self._raw_tf = (preprocess
                        if isinstance(preprocess, RawStageTransform) else None)
        if self._raw_tf is not None:
            from spn4cir_tpu.ops.preprocess import preprocess_batch_dynamic

            tf = self._raw_tf

            def _index_raw(canv, ext):
                x = preprocess_batch_dynamic(canv, ext, tf.dim, tf.kind)
                return backbone.index_features(params, x)

            self._index_features_raw = jax.jit(_index_raw)
        # mask + top-k on device: only (B, k) values/ids cross to the host
        # instead of the full (B, M) score matrix (2 MB/batch at 16k)
        self._topk = jax.jit(
            lambda scores, gids, k: jax.lax.top_k(
                _mask_rows(scores, gids), k),
            static_argnums=(2,))
        self._lock = threading.Lock()  # jit dispatch is not thread-safe-free
        # serializes gallery mutations (read->build->swap); queries only
        # snapshot self.index/self._name2gid and never take it
        self._mutate_lock = threading.Lock()
        # observability counters (served at GET /metrics); guarded by _lock
        # alongside the dispatch they describe
        self._stats = {"queries": 0, "dispatches": 0, "latency_ms_sum": 0.0}

    def metrics(self) -> dict:
        """Snapshot of serving counters + gallery facts."""
        with self._lock:
            stats = dict(self._stats)
        q = stats["queries"]
        total = stats.pop("latency_ms_sum")
        stats["latency_ms_avg"] = round(total / q, 3) if q else 0.0
        target = self.index.target
        stats["gallery_size"] = len(self.index.names)
        stats["gallery_dtype"] = str(getattr(target, "dtype", "?"))
        return stats

    def _record(self, n_queries: int, seconds: float) -> None:
        self._stats["queries"] += n_queries
        self._stats["dispatches"] += 1
        self._stats["latency_ms_sum"] += seconds * 1e3

    # -- gallery management --------------------------------------------------
    def refresh_index(self, index: GalleryIndex) -> None:
        """Atomically swap the gallery index (full reindex). In-flight
        queries finish against the old index; new ones see the new one."""
        name2gid = {n: i for i, n in enumerate(index.names)}
        with self._lock:
            self.index = index
            self._name2gid = name2gid

    def add_images(self, names: Sequence[str], images) -> int:
        """Append new gallery images: encode on-device, extend the index
        in place (names must be new). Returns the new gallery size."""
        if self.preprocess is None and not isinstance(images, np.ndarray):
            raise RuntimeError("service built without a preprocess pipeline")
        if isinstance(images, np.ndarray):
            feats = self.backbone.index_features(self.params,
                                                 jnp.asarray(images))
        elif self._raw_tf is not None:
            staged = [self.preprocess(im) for im in images]
            feats = self._index_features_raw(
                jnp.asarray(np.stack([c for c, _ in staged])),
                jnp.asarray(np.asarray([e for _, e in staged], np.int32)))
        else:
            images = np.stack([self.preprocess(im) for im in images])
            feats = self.backbone.index_features(self.params,
                                                 jnp.asarray(images))
        # one mutation at a time: concurrent add_images must not build from
        # the same base snapshot (lost update), and the three index-attribute
        # reads must come from ONE snapshot (no torn index)
        with self._mutate_lock:
            index = self.index
            dup = [n for n in names if n in self._name2gid]
            if dup:
                raise KeyError(f"gallery already contains {dup[:3]}...")
            new_index = self._extend_index(index, feats, names)
            self.refresh_index(new_index)
        return len(new_index.names)

    def _extend_index(self, index, feats, names: Sequence[str]):
        """Build the grown index from an `index_features` dict. Subclass
        hook: the sharded service rebuilds its padded/sharded layout here."""
        if _is_quant(index.target):
            from spn4cir_tpu.ops.bank_kernels import QuantBank, quantize_bank

            # per-row scales: quantizing the new rows alone is identical to
            # re-quantizing the whole grown gallery
            new = quantize_bank(feats["target"])
            target = QuantBank(
                jnp.concatenate([index.target.values, new.values], axis=0),
                jnp.concatenate([index.target.scales, new.scales], axis=0))
        else:
            target = jnp.concatenate(
                [index.target,
                 feats["target"].astype(index.target.dtype)], axis=0)
        return GalleryIndex(
            target=target,
            refer=np.concatenate(
                [index.refer, np.asarray(feats["refer"])], axis=0),
            names=list(index.names) + list(names),
        )

    # -- query paths --------------------------------------------------------
    def query_by_name(self, reference_name: str, caption: str,
                      k: Optional[int] = None) -> List[dict]:
        # snapshot: a concurrent refresh_index must not mix old gids with a
        # new gallery
        index, name2gid = self.index, self._name2gid
        gid = name2gid.get(reference_name)
        if gid is None:
            raise KeyError(f"unknown gallery image {reference_name!r}")
        refer = index.refer_rows(np.asarray([gid]))
        return self._run(index, refer, caption, k, exclude_gid=gid)

    def query_by_image(self, image, caption: str,
                       k: Optional[int] = None) -> List[dict]:
        """image: PIL.Image or (H, W, 3) array; preprocessed + encoded live."""
        if self.preprocess is None:
            raise RuntimeError("service built without a preprocess pipeline")
        if self._raw_tf is not None and not isinstance(image, np.ndarray):
            canv, ext = self.preprocess(image)
            refer = self._index_features_raw(
                jnp.asarray(canv[None]),
                jnp.asarray(np.asarray(ext, np.int32)[None]))["refer"]
        else:
            arr = (image if isinstance(image, np.ndarray)
                   else self.preprocess(image))
            refer = self._encode_refer(jnp.asarray(arr[None]))
        return self._run(self.index, refer, caption, k, exclude_gid=None)

    def _score_topk(self, index, queries, gids, kk: int):
        """Score `queries` against the gallery and return device (B, kk)
        (values, gids); per-row gids < 0 exclude nothing. Subclass hook:
        the sharded service replaces this with a distributed top-k."""
        if _is_quant(index.target):
            scores = quantized_score_queries(queries, index.target)
        else:
            scores = self.backbone.score_queries(queries, index.target)
        return self._topk(scores, jnp.asarray(gids), kk)

    def _run(self, index: GalleryIndex, refer, caption: str, k: Optional[int],
             exclude_gid: Optional[int]) -> List[dict]:
        import time

        k = min(k or self.default_k, len(index.names))
        kk = min(_round_up_k(k), len(index.names))
        t0 = time.monotonic()
        with self._lock:
            text = jnp.asarray(self.backbone.tokenize([caption]))
            query = self._fuse(refer, text)
            gid = -1 if exclude_gid is None else exclude_gid
            vals, idx = self._score_topk(index, query, np.asarray([gid]), kk)
            self._record(1, time.monotonic() - t0)
        vals, idx = np.asarray(vals[0]), np.asarray(idx[0])
        return [{"name": index.names[int(i)], "score": float(v)}
                for i, v in zip(idx[:k], vals[:k])]


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib; one process per chip, scale behind any LB)
# ---------------------------------------------------------------------------

def make_handler(service: RetrievalService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "gallery_size": len(service.index.names)})
            elif self.path == "/metrics":
                self._send(200, service.metrics())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length))
                if self.path == "/retrieve":
                    caption = req["caption"]
                    k = req.get("k")
                    if "reference_name" in req:
                        results = service.query_by_name(req["reference_name"],
                                                        caption, k)
                    elif "image_b64" in req:
                        from PIL import Image

                        raw = base64.b64decode(req["image_b64"])
                        results = service.query_by_image(
                            Image.open(io.BytesIO(raw)), caption, k)
                    else:
                        raise KeyError("need reference_name or image_b64")
                    self._send(200, {"results": results})
                elif self.path == "/gallery/add":
                    from PIL import Image

                    items = req["images"]  # {name: image_b64}
                    names = list(items)
                    images = [Image.open(io.BytesIO(base64.b64decode(b)))
                              for b in items.values()]
                    size = service.add_images(names, images)
                    self._send(200, {"status": "ok", "gallery_size": size})
                else:
                    self._send(404, {"error": "unknown path"})
            except KeyError as exc:
                self._send(400, {"error": str(exc)})
            except Exception as exc:  # pragma: no cover
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def serve(service: RetrievalService, host: str = "0.0.0.0", port: int = 8080
          ) -> ThreadingHTTPServer:
    """Start the HTTP server on a background thread; returns the server
    (call .shutdown() to stop)."""
    server = ThreadingHTTPServer((host, port), make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


class BatchingRetrievalService(RetrievalService):
    """Coalesces concurrent name-referenced queries into one fused+scored
    device dispatch (micro-batching; requests wait at most `max_delay_s`).
    Query-by-image requests fall back to the base single-query path."""

    def __init__(self, *args, max_batch: int = 32, max_delay_s: float = 0.005,
                 **kw):
        super().__init__(*args, **kw)
        import queue

        self.max_batch = max_batch
        self.max_delay_s = max_delay_s
        self._batches_dispatched = 0
        self._queue: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def query_by_name(self, reference_name: str, caption: str,
                      k: Optional[int] = None) -> List[dict]:
        index, name2gid = self.index, self._name2gid
        gid = name2gid.get(reference_name)
        if gid is None:
            raise KeyError(f"unknown gallery image {reference_name!r}")
        event = threading.Event()
        slot: dict = {}
        self._queue.put((index, gid, caption, k, event, slot))
        event.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["results"]

    def _loop(self):
        import queue
        import time

        while True:
            first = self._queue.get()
            batch = [first]
            deadline = time.monotonic() + self.max_delay_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(batch)
            except Exception as exc:  # propagate to still-waiting waiters
                # (never clobber groups an earlier index snapshot already
                # delivered — their callers may not have read the slot yet)
                for _, _, _, _, event, slot in batch:
                    if not event.is_set():
                        slot["error"] = exc
                        event.set()

    def _run_batch(self, batch):
        import numpy as np

        # a refresh between enqueue and dispatch splits the batch per index
        # snapshot so gids always match the gallery they came from
        by_index = {}
        for item in batch:
            by_index.setdefault(id(item[0]), []).append(item)
        for group in by_index.values():
            index = group[0][0]
            gids = np.asarray([item[1] for item in group])
            captions = [item[2] for item in group]
            refer = index.refer_rows(gids)
            kmax = min(_round_up_k(max(
                min(item[3] or self.default_k, len(index.names))
                for item in group)), len(index.names))
            import time

            t0 = time.monotonic()
            with self._lock:
                text = jnp.asarray(self.backbone.tokenize(captions))
                queries = self._fuse(refer, text)
                vals, idx = self._score_topk(index, queries, gids, kmax)
                self._record(len(group), time.monotonic() - t0)
            vals, idx = np.asarray(vals), np.asarray(idx)
            self._batches_dispatched += 1
            for row, (_, gid, _, k, event, slot) in enumerate(group):
                kk = min(k or self.default_k, len(index.names))
                slot["results"] = [
                    {"name": index.names[int(i)], "score": float(v)}
                    for i, v in zip(idx[row, :kk], vals[row, :kk])]
                event.set()
