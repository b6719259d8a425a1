#!/usr/bin/env python
"""Encoder-precompute throughput: catalog -> embedding tables on TPU.

The reference builds its feature cache with a serial per-item CPU loop —
PIL decode + one encoder forward per item
(/root/reference/scripts/precompute_cache.py:120-132). Here the same job
is batched XLA forwards over device-resident inputs
(encoders/precompute.py): host work is concurrent JPEG decode only;
resize/normalize and the encoder run compiled on the TPU.

Measures steady-state items/sec (compile excluded via a warmup batch)
for the vision (ResNet-50, 224px, including host JPEG decode) and
language (MiniLM geometry, seq 128) table builds, on the exact
production path: ItemFeatureStore.image_batch_uint8 -> device
normalize -> encoder ``pooled``. Random weights — zero-egress env;
throughput is weight-independent.

Usage: python scripts/bench_precompute.py [n_items] [batch_size]
Prints one JSON line per modality on stdout.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SEQ_LEN = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    from pixelrec_multimodal_tpu.data.processors.image_processor import (
        PREPROCESS_SPECS,
    )
    from pixelrec_multimodal_tpu.encoders.registry import (
        build_language_encoder,
        build_vision_encoder,
    )

    log(f"devices: {jax.devices()}; n_items={n_items} batch={batch}")
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix='bench_precompute_')
    # Small set of distinct JPEGs reused across item ids via symlinks —
    # per-item decode cost is real, disk usage bounded.
    n_distinct = min(n_items, 256)
    for j in range(n_distinct):
        arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        Image.fromarray(arr).save(f"{tmp}/src{j}.jpg", quality=85)
    item_ids = np.array([f'it{j}' for j in range(n_items)])
    for j, iid in enumerate(item_ids):
        os.symlink(f"{tmp}/src{j % n_distinct}.jpg", f"{tmp}/{iid}.jpg")

    store = ItemFeatureStore(
        n_items, item_ids, vision_model='resnet',
        language_model='sentence-bert', image_folder=tmp,
        max_image_cache_items=0)  # no cache: every decode is real work

    # ------------------------------------------------------------- vision
    spec = PREPROCESS_SPECS['resnet']
    vmodel = build_vision_encoder('resnet', dtype=jnp.bfloat16)
    example = jnp.zeros((batch, 3, spec.crop_size, spec.crop_size),
                        jnp.float32)
    vparams = vmodel.init(jax.random.PRNGKey(0), example)['params']
    mean = jnp.asarray(spec.mean, jnp.float32).reshape(1, 1, 1, 3)
    std = jnp.asarray(spec.std, jnp.float32).reshape(1, 1, 1, 3)

    @jax.jit
    def vforward(p, frames_u8):
        x = frames_u8.astype(jnp.float32) / 255.0
        x = ((x - mean) / std).transpose(0, 3, 1, 2)
        return vmodel.apply({'params': p}, x, method='pooled')

    from concurrent.futures import ThreadPoolExecutor

    idx0 = np.arange(batch)
    np.asarray(vforward(vparams, jnp.asarray(
        store.image_batch_uint8(idx0))))  # compile + warm

    def staged(s):  # decode + host->device transfer off the main thread
        return jnp.asarray(store.image_batch_uint8(np.arange(s, s + batch)))

    starts = [s for s in range(0, n_items, batch) if s + batch <= n_items]
    t0 = time.time()
    done = 0
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(staged, starts[0])
        for i, s in enumerate(starts):
            frames = fut.result()
            if i + 1 < len(starts):
                fut = ex.submit(staged, starts[i + 1])
            np.asarray(vforward(vparams, frames))
            done += batch
    dt = time.time() - t0
    log(f"vision (ResNet-50 224px, incl. host JPEG decode): "
        f"{done / dt:,.0f} items/s")
    print(json.dumps({
        'metric': 'precompute_vision_items_per_sec',
        'value': round(done / dt, 1), 'unit': 'items/sec/chip'}),
        flush=True)

    # ----------------------------------------------------------- language
    lmodel = build_language_encoder('sentence-bert', dtype=jnp.bfloat16)
    ids_t = rng.integers(0, 30000, (n_items, SEQ_LEN)).astype(np.int32)
    mask_t = np.ones((n_items, SEQ_LEN), dtype=np.int32)
    lparams = lmodel.init(jax.random.PRNGKey(1), ids_t[:batch],
                          mask_t[:batch])['params']

    @jax.jit
    def lforward(p, ids, mask):
        return lmodel.apply({'params': p}, ids, mask, method='pooled')

    np.asarray(lforward(lparams, ids_t[:batch], mask_t[:batch]))
    t0 = time.time()
    done = 0
    for s in range(0, n_items, batch):
        if s + batch > n_items:
            break
        np.asarray(lforward(lparams, ids_t[s:s + batch],
                            mask_t[s:s + batch]))
        done += batch
    dt = time.time() - t0
    log(f"language (MiniLM geometry, seq {SEQ_LEN}): "
        f"{done / dt:,.0f} items/s")
    print(json.dumps({
        'metric': 'precompute_language_items_per_sec',
        'value': round(done / dt, 1), 'unit': 'items/sec/chip'}),
        flush=True)


if __name__ == '__main__':
    main()
