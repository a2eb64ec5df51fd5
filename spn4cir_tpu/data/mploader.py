"""Sharded multi-process input pipeline: N worker processes × native C++
decode threads, shared-memory batch transport, in-order delivery.

Replaces the reference's torch DataLoader workers (clip4cir/train.py:77,
num_workers=4) for the host-bound phases — gallery indexing, bank
extraction, stage-1 live-encode epochs. One worker process saturates at
the GIL-adjacent ~8 native threads of spn4cir_tpu.native.NativeLoader;
feeding a chip at production rate (RN50x4: ~2.7k img/s, ViT-B/32: ~7.3k)
needs tens of cores, hence processes.

Design:
  * workers are spawn-context processes that import NO jax — only numpy +
    the ctypes-bound native loader (each builds/loads the cached .so);
  * batches travel through multiprocessing.shared_memory blocks sized
    (batch, dim, dim, 3) f32, recycled through a free-list — steady-state
    allocation is zero and the only per-batch copies are the decode writes
    themselves;
  * requests carry sequence ids; delivery reorders to submission order, so
    labels/captions held back in the coordinating process stay aligned;
  * the consuming loop overlaps with device compute for free: jax dispatch
    is async, so while the chip encodes batch i the workers decode i+1..i+k
    (k = `prefetch` in-flight batches per worker).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
from multiprocessing import shared_memory
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_STOP = "__stop__"


def _worker_main(task_q, result_q, shm_names, shape, kind, dim, ratio,
                 mean, std, threads, raw_canvas):
    """Worker process body: decode path batches into shared memory.
    With `raw_canvas` > 0 the blocks hold uint8 staging canvases instead of
    preprocessed float32 (the on-device-preprocess input contract); the tiny
    (B, 2) extents array rides the result queue."""
    # no jax in workers — only numpy + the ctypes native loader
    from spn4cir_tpu.native import (NativeLoader, NativeRawStager,
                                    native_available)

    use_native = (native_available()
                  and os.environ.get("SPN4CIR_NATIVE", "1") != "0")
    if raw_canvas:
        fallback = _pil_raw_fallback(kind, raw_canvas, ratio)
        native = (NativeRawStager(kind, raw_canvas, ratio,
                                  num_threads=threads, fallback=fallback)
                  if use_native else None)
    else:
        fallback = _pil_fallback(kind, dim, ratio, mean, std)
        native = (NativeLoader(kind, dim, ratio, mean, std,
                               num_threads=threads, fallback=fallback)
                  if use_native else None)
    shms = {name: shared_memory.SharedMemory(name=name) for name in shm_names}
    try:
        while True:
            item = task_q.get()
            if item == _STOP:
                break
            seq, shm_name, paths = item
            buf = np.ndarray(shape, np.uint8 if raw_canvas else np.float32,
                             buffer=shms[shm_name].buf)
            try:
                n = len(paths)
                extents = None
                if raw_canvas:
                    extents = np.zeros((shape[0], 2), np.int32)
                    if native is not None:
                        native.stage_batch(paths, buf[:n], extents[:n])
                    else:
                        for i, p in enumerate(paths):
                            buf[i], extents[i] = fallback(p)
                elif native is not None:
                    buf[:n] = native.decode_batch(paths)
                else:
                    for i, p in enumerate(paths):
                        buf[i] = fallback(p)
                result_q.put((seq, shm_name, n, extents, None))
            except Exception as exc:  # noqa: BLE001 — forwarded to parent
                result_q.put((seq, shm_name, 0, None, repr(exc)))
    finally:
        for s in shms.values():
            s.close()


def _pil_fallback(kind, dim, ratio, mean, std):
    from spn4cir_tpu.data.transforms import ImageTransform

    tf = ImageTransform(kind, dim, ratio, tuple(mean), tuple(std))

    def decode(path):
        from PIL import Image

        return np.asarray(tf(Image.open(path)), np.float32)

    return decode


def _pil_raw_fallback(kind, canvas, ratio):
    from spn4cir_tpu.data.transforms import stage_raw_image

    def decode(path):
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        return stage_raw_image(arr, canvas, kind, ratio)

    return decode


class MPLoader:
    """Multi-process decode+preprocess over a fixed transform geometry.

    `map_batches(batches)` streams lists of image paths through the worker
    pool and yields (B, dim, dim, 3) float32 arrays IN ORDER. The yielded
    array is a view into a recycled shared-memory block — it is valid until
    the next iteration step; callers hand it straight to jnp.asarray /
    device_put (which copies) before advancing. Use as a context manager
    or call close()."""

    def __init__(self, kind: str, dim: int, batch_size: int,
                 target_ratio: float = 1.25,
                 mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
                 std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
                 num_procs: int = 4, threads_per_proc: int = 0,
                 prefetch: int = 2, raw_canvas: int = 0):
        """`raw_canvas` > 0 switches to decode-only staging for the
        on-device preprocess: blocks hold (B, canvas, canvas, 3) uint8 and
        map_batches yields (RawBatch(canvas, extents), n)."""
        self.raw_canvas = int(raw_canvas)
        side = self.raw_canvas or dim
        self.dtype = np.uint8 if self.raw_canvas else np.float32
        self.shape = (batch_size, side, side, 3)
        self.batch_size = batch_size
        nbytes = int(np.prod(self.shape)) * self.dtype().itemsize
        n_blocks = max(num_procs * prefetch + 2, 4)
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        self._shms = [shared_memory.SharedMemory(create=True, size=nbytes)
                      for _ in range(n_blocks)]
        self._free: "queue.SimpleQueue[str]" = queue.SimpleQueue()
        for s in self._shms:
            self._free.put(s.name)
        names = [s.name for s in self._shms]
        self._procs = [
            ctx.Process(
                target=_worker_main,
                args=(self._task_q, self._result_q, names, self.shape,
                      kind, dim, target_ratio, tuple(mean), tuple(std),
                      threads_per_proc, self.raw_canvas),
                daemon=True)
            for _ in range(num_procs)
        ]
        for p in self._procs:
            p.start()
        self._closed = False

    # -- streaming ---------------------------------------------------------

    def map_batches(self, batches: Iterable[Sequence[str]]
                    ) -> Iterator[Tuple[np.ndarray, int]]:
        """Yield (array_view, n_valid) per input batch, in order."""
        pending: dict = {}
        next_seq = 0
        submitted = 0
        it = iter(batches)
        exhausted = False
        held: Optional[str] = None  # block owned by the batch just yielded

        def submit_one() -> bool:
            nonlocal submitted, exhausted
            if exhausted:
                return False
            try:
                paths = list(next(it))
            except StopIteration:
                exhausted = True
                return False
            assert len(paths) <= self.batch_size, (len(paths), self.batch_size)
            block = self._free.get()  # blocks in flight are bounded by pool
            self._task_q.put((submitted, block, paths))
            submitted += 1
            return True

        # prime the pipeline up to the block-pool depth (minus the one
        # block the consumer holds while processing a yielded batch)
        for _ in range(len(self._shms) - 1):
            if not submit_one():
                break
        while next_seq < submitted:
            while next_seq not in pending:
                try:
                    seq, block, n, extents, err = self._result_q.get(
                        timeout=5.0)
                except queue.Empty:
                    # a worker OOM-kill/segfault raises nothing in the
                    # child — detect the corpse instead of hanging forever
                    dead = [p for p in self._procs if not p.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f"{len(dead)} loader worker(s) died "
                            f"(exitcodes {[p.exitcode for p in dead]}) — "
                            "decode batch lost")
                    continue
                pending[seq] = (block, n, extents, err)
            block, n, extents, err = pending.pop(next_seq)
            if err is not None:
                self._free.put(block)
                raise IOError(f"worker decode failed: {err}")
            shm = next(s for s in self._shms if s.name == block)
            arr = np.ndarray(self.shape, self.dtype, buffer=shm.buf)
            if held is not None:
                self._free.put(held)  # previous batch's block is free now
            held = block
            next_seq += 1
            submit_one()
            if self.raw_canvas:
                from spn4cir_tpu.data.transforms import RawBatch

                yield RawBatch(arr, extents), n
            else:
                yield arr, n
        if held is not None:
            self._free.put(held)

    # -- lifecycle ---------------------------------------------------------

    def close(self):
        if self._closed:
            return
        self._closed = True
        for _ in self._procs:
            self._task_q.put(_STOP)
        for p in self._procs:
            p.join(timeout=10)
            if p.is_alive():  # pragma: no cover
                p.terminate()
        for s in self._shms:
            s.close()
            try:
                s.unlink()
            except FileNotFoundError:  # pragma: no cover
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def batched_paths(paths: Sequence[str], batch_size: int
                  ) -> List[List[str]]:
    return [list(paths[i: i + batch_size])
            for i in range(0, len(paths), batch_size)]
