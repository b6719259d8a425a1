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


class TestParallelDecode:
    """Thread-pool JPEG decode in the feature store's image tier (the host
    input stage the reference parallelized with DataLoader workers,
    reference scripts/train.py:105-126)."""

    @staticmethod
    def _store(tmp_path, n=24, workers=None):
        from PIL import Image
        from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
        rng = np.random.default_rng(0)
        folder = tmp_path / 'imgs'
        folder.mkdir(exist_ok=True)
        ids = np.asarray([f'it{j}' for j in range(n)])
        for j in range(n):
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(folder / f'it{j}.jpg')
        kw = {} if workers is None else {'decode_workers': workers}
        return ItemFeatureStore(n, ids, vision_model='resnet',
                                image_folder=str(folder), **kw)

    def test_parallel_equals_serial(self, tmp_path):
        pos = np.asarray([3, 7, 1, 7, 20, 0])
        par = self._store(tmp_path)
        ser = self._store(tmp_path, workers=1)
        np.testing.assert_array_equal(par.image_batch(pos),
                                      ser.image_batch(pos))
        np.testing.assert_array_equal(par.image_batch_uint8(pos),
                                      ser.image_batch_uint8(pos))
        # Second call is a pure cache hit, still identical.
        np.testing.assert_array_equal(par.image_batch(pos),
                                      ser.image_batch(pos))

    def test_lru_bound_holds_under_parallel_decode(self, tmp_path):
        store = self._store(tmp_path)
        store._max_image_cache_items = 5
        store.image_batch(np.arange(24))
        assert len(store._image_cache) <= 5

    def test_store_pickles_without_pool(self, tmp_path):
        import pickle
        store = self._store(tmp_path)
        store.image_batch(np.arange(8))  # pool instantiated
        clone = pickle.loads(pickle.dumps(store))
        np.testing.assert_array_equal(clone.image_batch(np.asarray([2, 4])),
                                      store.image_batch(np.asarray([2, 4])))
