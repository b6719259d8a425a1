# pixelrec_multimodal_tpu/data/loader.py
"""Host->HBM prefetching batch loader.

The reference overlaps host-side batch assembly with GPU compute via
DataLoader worker processes + pinned memory (reference
scripts/train.py:105-126). The TPU-native equivalent is simpler and
faster: JAX dispatch is asynchronous, so a single background thread that
(a) assembles the next host batch (image gather / numpy stacking — the
only real host work) and (b) issues ``jax.device_put`` for it keeps the
device queue fed while the current step executes. A bounded queue gives
double/triple buffering in HBM without unbounded memory growth.

This matters only for the raw-input (unfrozen-encoder) path where batches
carry pixels/tokens; the frozen path ships index triples and compiles
whole epochs into one device call (training/steps.py), which no loader
can beat.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np


class PrefetchLoader:
    """Iterate device-resident batches, assembled ahead of consumption.

    Parameters
    ----------
    batches:
        Host-batch iterable (dicts of numpy arrays), e.g.
        ``dataset.batches(bs, include_raw=('image', 'text'))``.
    prefetch:
        Batches to keep in flight beyond the one being consumed
        (2 = double buffering).
    sharding:
        Optional ``jax.sharding.Sharding`` applied in ``device_put``
        (batch-axis sharding for dp meshes). None = default device.
    transform:
        Optional host-side callable applied to each batch dict before
        transfer (e.g. dtype casts).
    """

    _END = object()

    def __init__(self, batches: Iterable[Dict[str, np.ndarray]],
                 prefetch: int = 2, sharding=None,
                 transform: Optional[Callable[[dict], dict]] = None):
        if prefetch < 1:
            raise ValueError(f"prefetch must be >= 1, got {prefetch}")
        self._batches = batches
        self._prefetch = prefetch
        self._sharding = sharding
        self._transform = transform

    def __iter__(self) -> Iterator[dict]:
        import jax

        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()
        err: list = []

        def worker():
            try:
                for host_batch in self._batches:
                    if stop.is_set():
                        return
                    if self._transform is not None:
                        host_batch = self._transform(host_batch)
                    if self._sharding is not None:
                        dev = {k: jax.device_put(v, self._sharding)
                               for k, v in host_batch.items()}
                    else:
                        dev = {k: jax.device_put(v)
                               for k, v in host_batch.items()}
                    # Bounded put that stays responsive to cancellation.
                    while not stop.is_set():
                        try:
                            q.put(dev, timeout=0.05)
                            break
                        except queue.Full:
                            pass
            except BaseException as e:  # surface in consumer thread
                err.append(e)
            finally:
                # The END sentinel must reach a live consumer even when the
                # queue is momentarily full; only a cancelled (draining)
                # consumer may go without it.
                while True:
                    try:
                        q.put(self._END, timeout=0.05)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=worker, daemon=True,
                             name='pixelrec-prefetch')
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._END:
                    break
                yield item
        finally:
            # Early consumer exit: tell the worker to stop after the batch
            # in flight (no further assembly/device_put work), then drain.
            stop.set()
            while t.is_alive():
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.05)
        if err:
            raise err[0]


def prefetch_to_device(batches: Iterable[Dict[str, np.ndarray]],
                       prefetch: int = 2, sharding=None) -> Iterator[dict]:
    """Functional shorthand: ``for b in prefetch_to_device(ds.batches(...))``."""
    return iter(PrefetchLoader(batches, prefetch=prefetch, sharding=sharding))
