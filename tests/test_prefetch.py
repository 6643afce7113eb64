"""Prefetch loader: ordering, parallelism, error propagation."""

import time

import pytest

from vis_zephyr_tpu.data.prefetch import PrefetchLoader


class SlowDataset:
    def __init__(self, delay=0.01):
        self.delay = delay

    def __getitem__(self, i):
        time.sleep(self.delay)
        if i == 99:
            raise ValueError("poison sample")
        return i


def collate(samples):
    return list(samples)


def test_batches_in_order():
    ds = SlowDataset()
    batches = [[0, 1], [2, 3], [4, 5], [6, 7]]
    loader = PrefetchLoader(ds, collate, batches, num_workers=3)
    out = list(loader)
    assert out == batches
    assert len(loader) == 4


def test_parallelism_speedup():
    ds = SlowDataset(delay=0.05)
    batches = [[i] for i in range(8)]
    t0 = time.perf_counter()
    list(PrefetchLoader(ds, collate, batches, num_workers=4))
    parallel = time.perf_counter() - t0
    assert parallel < 8 * 0.05 * 0.9  # meaningfully faster than serial


def test_error_propagates():
    ds = SlowDataset()
    loader = PrefetchLoader(ds, collate, [[0], [99], [2]], num_workers=2)
    it = iter(loader)
    assert next(it) == [0]
    with pytest.raises(ValueError, match="poison"):
        next(it)
