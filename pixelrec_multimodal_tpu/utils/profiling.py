# pixelrec_multimodal_tpu/utils/profiling.py
"""Tracing and throughput instrumentation.

The reference has no profiling beyond coarse wall-clock prints (SURVEY.md §5.1:
scripts/train.py:42-64, precompute_cache.py:115-136). This module adds the
TPU-native observability layer: ``jax.profiler`` trace capture around any code
region (viewable in TensorBoard/Perfetto), named step annotations, and
throughput counters (examples/sec, scored pairs/sec, achieved FLOPS vs a
roofline estimate).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region.

    Open the resulting directory with TensorBoard (profile plugin) or
    Perfetto. Example:

        with trace('/tmp/profile'):
            train_step(state, batch)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_annotation(name: str) -> Iterator[None]:
    """Annotate a region so it shows up named in profiler timelines."""
    with jax.profiler.StepTraceAnnotation(name):
        yield


@dataclass
class ThroughputMeter:
    """Accumulates work units over wall-clock time.

    Used for the per-step token/pair throughput counters the reference lacks:

        meter = ThroughputMeter(unit='pairs')
        with meter.measure(n=batch_pairs):
            step(...)
        print(meter.summary())
    """
    unit: str = 'examples'
    total_units: float = 0.0
    total_seconds: float = 0.0
    calls: int = 0
    # Optional hardware ceiling for utilization reporting.
    peak_flops: Optional[float] = None
    flops_per_unit: Optional[float] = None

    @contextlib.contextmanager
    def measure(self, n: float) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total_units += n
            self.total_seconds += dt
            self.calls += 1

    def add(self, n: float, seconds: float):
        self.total_units += n
        self.total_seconds += seconds
        self.calls += 1

    @property
    def rate(self) -> float:
        return self.total_units / self.total_seconds \
            if self.total_seconds > 0 else 0.0

    def utilization(self) -> Optional[float]:
        """Achieved / peak FLOPS, when both are configured."""
        if not (self.peak_flops and self.flops_per_unit):
            return None
        return self.rate * self.flops_per_unit / self.peak_flops

    def summary(self) -> Dict[str, float]:
        out = {
            f'{self.unit}_per_sec': self.rate,
            'total_seconds': self.total_seconds,
            'calls': self.calls,
        }
        util = self.utilization()
        if util is not None:
            out['flops_utilization'] = util
        return out


@dataclass
class StepTimer:
    """Per-phase wall-clock accounting for a training loop (data / step /
    eval / checkpoint), printable as one line per epoch."""
    phases: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + \
                time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.phases.values())
        parts = [f"{k}={v:.2f}s" for k, v in sorted(self.phases.items())]
        return f"total={total:.2f}s " + ' '.join(parts)

    def reset(self):
        self.phases.clear()


def device_memory_stats() -> Dict[str, int]:
    """Per-device HBM usage when the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                out[str(d)] = {
                    'bytes_in_use': stats.get('bytes_in_use', 0),
                    'peak_bytes_in_use': stats.get('peak_bytes_in_use', 0),
                }
        except Exception:
            continue
    return out
