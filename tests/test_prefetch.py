"""Async prefetcher semantics."""

import time

import pytest

from spn4cir_tpu.data.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))


def test_exception_propagates_at_position():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError):
        next(it)


def test_overlaps_producer_and_consumer():
    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            yield i

    t0 = time.time()
    for _ in prefetch(slow_gen(), depth=2):
        time.sleep(0.05)  # consumer work overlaps producer sleep
    elapsed = time.time() - t0
    assert elapsed < 0.35  # serial would be ~0.4s
