"""Async host-side batch prefetching.

The reference overlaps decode with GPU compute via DataLoader worker
processes (`clip4cir/train.py:77`); here a background thread keeps N batches
ahead of the device so image decode/tokenize never serializes with the
jitted step (host input feed is the usual TPU bottleneck)."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterator: Iterable, depth: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread, buffering up to `depth` items.
    Exceptions propagate to the consumer at the failing position."""
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as exc:  # propagate into the consumer
            q.put(exc)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
