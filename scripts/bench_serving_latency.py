#!/usr/bin/env python
"""Online-serving latency: per-request top-K over the full catalog.

The throughput benches (bench.py, bench_fusion.py) measure offline bulk
scoring; serving cares about request latency. This measures
`CatalogScorer.top_k` end-to-end (host call -> device -> fetched values)
at the flagship concat geometry (65k catalog, 2048/384 towers,
[512,256,128] head) for request batch sizes 1 / 64 / 1024, reporting
p50/p95 over N requests after warmup.

Reference pattern being replaced: one user's recommendations =
|catalog|/256 sequential torch-CPU batches
(/root/reference/src/inference/recommender.py:96-106) — ~2.8s/request at
the measured 23.4k pairs/s.

NOTE on this environment: every device call pays the dev tunnel's ~31ms
fixed dispatch/fetch overhead (CLAUDE.md), which dominates single-user
latency here; a co-located host sees the device-time floor instead.

Prints one JSON document on stdout.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITEMS = 65536
N_TAGS = 64
EMB = 64
VISION_DIM = 2048
LANG_DIM = 384
NUM_FEAT = 7
HIDDEN = (512, 256, 128)
TOP_K = 50
N_REQ = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--fusion', type=str, default='concatenate',
                    choices=['concatenate', 'gated', 'attention'])
    ap.add_argument('--cascade', action='store_true',
                    help='attention only: serve through an auto-calibrated '
                         'cascade plan (falls back to exact if the plan '
                         'does not beat the exact scan)')
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
    from pixelrec_multimodal_tpu.models.multimodal import (
        MultimodalRecommender)

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    model = MultimodalRecommender(
        n_users=4096, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUM_FEAT, embedding_dim=EMB,
        vision_feature_dim=VISION_DIM, language_feature_dim=LANG_DIM,
        use_contrastive=False, fusion_hidden_dims=HIDDEN,
        fusion_type=args.fusion, num_attention_heads=4,
        use_batch_norm=True, dropout_rate=0.0,
        dtype=jnp.bfloat16)
    store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
    store.tables['tag_idx'] = rng.integers(
        0, N_TAGS, N_ITEMS).astype(np.int32)
    store.tables['numerical'] = rng.standard_normal(
        (N_ITEMS, NUM_FEAT)).astype(np.float32)
    store.tables['vision_emb'] = rng.standard_normal(
        (N_ITEMS, VISION_DIM)).astype(np.float32)
    store.tables['language_emb'] = rng.standard_normal(
        (N_ITEMS, LANG_DIM)).astype(np.float32)

    B = 8
    variables = model.init(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
        vision_features=jnp.zeros((B, VISION_DIM), jnp.float32),
        language_features=jnp.zeros((B, LANG_DIM), jnp.float32),
        numerical_features=jnp.zeros((B, NUM_FEAT), jnp.float32),
        train=False)
    t0 = time.time()
    scorer = CatalogScorer(model, variables, store)
    log(f"tower build: {time.time() - t0:.1f}s")
    plan = None
    if args.cascade:
        t0 = time.time()
        plan = scorer.auto_cascade(
            np.arange(4096, dtype=np.int32), TOP_K)
        log(f"auto_cascade: {time.time() - t0:.1f}s -> {plan}")

    out = {'catalog_items': N_ITEMS, 'top_k': TOP_K, 'n_requests': N_REQ,
           'fusion': args.fusion,
           'cascade_plan': None if plan is None else
           {k: (v if isinstance(v, str) else float(v))
            for k, v in plan.items()}}
    for bs in (1, 64, 1024):
        users = rng.integers(0, 4096, (N_REQ + 3, bs)).astype(np.int32)
        # warmup/compile for this block class
        for w in range(3):
            v, i = scorer.top_k(users[w], TOP_K)
            _ = np.asarray(v)
        lat = []
        for r in range(N_REQ):
            t0 = time.time()
            v, i = scorer.top_k(users[3 + r], TOP_K)
            _ = np.asarray(v), np.asarray(i)   # fetch = request complete
            lat.append((time.time() - t0) * 1e3)
        lat = np.asarray(lat)
        row = {
            'p50_ms': round(float(np.percentile(lat, 50)), 2),
            'p95_ms': round(float(np.percentile(lat, 95)), 2),
            'mean_ms': round(float(lat.mean()), 2),
            'throughput_users_per_sec': round(
                bs * 1000.0 / float(np.percentile(lat, 50)), 1),
        }
        out[f'batch_{bs}'] = row
        log(f"batch {bs:5d}: p50 {row['p50_ms']:8.2f} ms  "
            f"p95 {row['p95_ms']:8.2f} ms  "
            f"({row['throughput_users_per_sec']:,.0f} users/s)")
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
