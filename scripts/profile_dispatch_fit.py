#!/usr/bin/env python
"""Separate fixed per-call dispatch overhead from true device compute.

The per-stage attribution (profile_resnet_stages.py) showed the
stem+pool prefix "taking" 28ms at 2% of peak while every later stage
delta ran at 76%+ — the first row absorbs this environment's ~31ms
fixed dispatch/fetch overhead (CLAUDE.md). This profiler times the full
ResNet-50 forward at several batch sizes and fits t(B) = a + b*B by
least squares: ``a`` is the fixed overhead, ``b`` the true per-sample
device time, from which the REAL model-flops utilization follows.

Prints one JSON document on stdout.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCHES = (64, 128, 256, 512)
REPS = 8
V5E_PEAK_TFLOPS = 159.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pixelrec_multimodal_tpu.encoders.registry import (
        build_vision_encoder)

    log(f"devices: {jax.devices()}")
    vis = build_vision_encoder('resnet', dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((max(BATCHES), 3, 224, 224)),
                         jnp.float32)
    params = vis.init(jax.random.PRNGKey(0), images[:2])['params']

    @jax.jit
    def fwd(p, x):
        return jnp.sum(vis.apply({'params': p}, x)[1].astype(jnp.float32))

    rows = {}
    gf_per_sample = None
    for B in BATCHES:
        x = images[:B]
        try:
            ca = fwd.lower(params, x).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            gf_per_sample = float(ca['flops']) / 1e9 / B
        except Exception:
            pass
        _ = float(fwd(params, x))
        ts = []
        for _i in range(REPS):
            t0 = time.time()
            _ = float(fwd(params, x))
            ts.append(time.time() - t0)
        t = float(np.median(ts))
        rows[B] = t
        log(f"B={B:4d}: {t*1e3:7.2f} ms   ({B/t:8.0f} samples/s naive)")

    bs = np.asarray(sorted(rows), np.float64)
    ts = np.asarray([rows[int(b)] for b in bs], np.float64)
    slope, intercept = np.polyfit(bs, ts, 1)
    per_sample_us = slope * 1e6
    tflops = gf_per_sample / slope / 1e3 if gf_per_sample else None
    out = {
        'times_ms': {int(b): round(rows[int(b)] * 1e3, 2) for b in bs},
        'fixed_overhead_ms': round(intercept * 1e3, 2),
        'per_sample_us': round(per_sample_us, 1),
        'gflops_per_sample': round(gf_per_sample, 2) if gf_per_sample else None,
        'device_tflops': round(tflops, 1) if tflops else None,
        'device_pct_peak': (round(100 * tflops / V5E_PEAK_TFLOPS, 1)
                            if tflops else None),
        'device_samples_per_sec': round(1.0 / slope, 0),
    }
    log(f"fit: fixed {intercept*1e3:.1f} ms + {per_sample_us:.1f} us/sample"
        + (f" -> {tflops:.1f} TFLOPS = "
           f"{100*tflops/V5E_PEAK_TFLOPS:.0f}% of peak on device"
           if tflops else ""))
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
