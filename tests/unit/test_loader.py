"""PrefetchLoader: host->device double-buffered batch pipeline
(TPU-native replacement for the reference's DataLoader workers,
reference scripts/train.py:105-126)."""
import time

import jax
import numpy as np
import pytest

from pixelrec_multimodal_tpu.data.loader import (
    PrefetchLoader,
    prefetch_to_device,
)


def _host_batches(n, shape=(4, 3)):
    for i in range(n):
        yield {'x': np.full(shape, i, np.float32),
               'idx': np.arange(shape[0], dtype=np.int32) + i}


class TestPrefetchLoader:
    def test_yields_all_batches_in_order_on_device(self):
        out = list(PrefetchLoader(_host_batches(7)))
        assert len(out) == 7
        for i, b in enumerate(out):
            assert isinstance(b['x'], jax.Array)
            np.testing.assert_array_equal(np.asarray(b['x']),
                                          np.full((4, 3), i, np.float32))
            np.testing.assert_array_equal(np.asarray(b['idx']),
                                          np.arange(4, dtype=np.int32) + i)

    def test_empty_iterable(self):
        assert list(PrefetchLoader(iter(()))) == []

    def test_producer_exception_propagates(self):
        def bad():
            yield {'x': np.zeros(2, np.float32)}
            raise ValueError('decode failed')

        with pytest.raises(ValueError, match='decode failed'):
            list(PrefetchLoader(bad()))

    def test_transform_applied_on_host(self):
        loader = PrefetchLoader(
            _host_batches(3),
            transform=lambda b: {'x': b['x'] * 2})
        out = list(loader)
        assert set(out[0]) == {'x'}
        np.testing.assert_array_equal(np.asarray(out[1]['x']),
                                      np.full((4, 3), 2.0, np.float32))

    def test_invalid_prefetch_rejected(self):
        with pytest.raises(ValueError):
            PrefetchLoader(_host_batches(1), prefetch=0)

    def test_early_consumer_exit_does_not_hang(self):
        # Bounded queue + slow producer: breaking out must not deadlock.
        def slow():
            for b in _host_batches(50):
                time.sleep(0.005)
                yield b

        it = iter(PrefetchLoader(slow(), prefetch=1))
        t0 = time.time()
        next(it)
        next(it)
        it.close()
        assert time.time() - t0 < 2.0

    def test_early_exit_cancels_producer(self):
        # The worker must stop assembling batches after the consumer leaves,
        # not churn through the whole iterable into a drain loop.
        produced = []

        def counting():
            for i, b in enumerate(_host_batches(200)):
                produced.append(i)
                time.sleep(0.002)
                yield b

        it = iter(PrefetchLoader(counting(), prefetch=2))
        next(it)
        next(it)
        it.close()
        time.sleep(0.1)  # let the worker observe the stop flag and exit
        assert len(produced) < 20, (
            f"producer ran {len(produced)} batches after early exit")

    def test_sharded_device_put(self):
        from pixelrec_multimodal_tpu.parallel.mesh import (
            batch_sharding, make_mesh)
        mesh = make_mesh(jax.devices())
        sh = batch_sharding(mesh)
        out = list(PrefetchLoader(_host_batches(3, shape=(8, 2)),
                                  sharding=sh))
        assert out[0]['x'].sharding == sh

    def test_functional_shorthand(self):
        out = list(prefetch_to_device(_host_batches(2), prefetch=3))
        assert len(out) == 2

    def test_overlaps_production_with_consumption(self):
        # With prefetch=2, total wall time for a slow producer + slow
        # consumer is ~max(p, c), not p + c.
        produce_s = consume_s = 0.02
        n = 8

        def slow():
            for b in _host_batches(n):
                time.sleep(produce_s)
                yield b

        t0 = time.time()
        for _ in PrefetchLoader(slow(), prefetch=2):
            time.sleep(consume_s)
        overlapped = time.time() - t0
        serial_estimate = n * (produce_s + consume_s)
        assert overlapped < serial_estimate * 0.85
