"""MinibatchPrefetcher: ordering, determinism, bounded depth, errors."""

import threading
import time

import pytest

from pytorch_sparse_tpu.sample.loader import MinibatchPrefetcher


def test_order_preserved_under_racing_workers():
    def make(it):
        # Reverse-sleep so late indices finish first: the reorder buffer
        # must still yield 0, 1, 2, ...
        time.sleep(0.002 * (8 - it % 8))
        return it * 10

    got = list(MinibatchPrefetcher(make, 24, num_workers=4, depth=6))
    assert got == [it * 10 for it in range(24)]


def test_single_worker_matches_multi():
    def make(it):
        return (it, it ** 2)

    a = list(MinibatchPrefetcher(make, 17, num_workers=1))
    b = list(MinibatchPrefetcher(make, 17, num_workers=5, depth=3))
    assert a == b


def test_depth_bounds_in_flight():
    lock = threading.Lock()
    live = [0]
    peak = [0]

    def make(it):
        with lock:
            live[0] += 1
            peak[0] = max(peak[0], live[0])
        time.sleep(0.005)
        return it

    loader = MinibatchPrefetcher(make, 30, num_workers=8, depth=3)
    for i, b in enumerate(loader):
        with lock:
            live[0] -= 1
        time.sleep(0.002)  # slow consumer -> workers must throttle
    assert peak[0] <= 3


def test_worker_exception_propagates():
    def make(it):
        if it == 5:
            raise RuntimeError("sampler exploded")
        return it

    loader = MinibatchPrefetcher(make, 10, num_workers=2)
    with pytest.raises(RuntimeError, match="sampler exploded"):
        list(loader)
