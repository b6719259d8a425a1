#!/usr/bin/env python
"""Decompose the full-catalog fast-path wall-clock: kernel vs top-k merge.

The headline number (bench.py) runs the fused pairwise-MLP kernel AND the
streaming top-k merge per chunk. To know what stands between the achieved
rate and the compute roofline, time three jitted variants on the same data:

  scores_only   — the lax.scan over chunks with each chunk's scores reduced
                  to a running sum (no masks, no top_k): pure kernel + scan.
  topk_k1       — the real scan with k=1 (merge = max-reduce).
  topk_full     — the production path, k=50.

Timing fetches values (through the axon tunnel ``block_until_ready`` does
not wait — CLAUDE.md). Prints one JSON line per component on stdout.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITEMS = 65536
N_USERS = 1024
EMB = 64
VISION_DIM = 2048
LANG_DIM = 384
NUM_FEAT = 7
HIDDEN = (512, 256, 128)
N_TAGS = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
    from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
    from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
        compute_user_first, pallas_pairwise_scores)

    log(f"devices: {jax.devices()}")
    model = MultimodalRecommender(
        n_users=4096, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUM_FEAT, embedding_dim=EMB,
        vision_feature_dim=VISION_DIM, language_feature_dim=LANG_DIM,
        use_contrastive=False, fusion_hidden_dims=HIDDEN,
        fusion_type='concatenate', use_batch_norm=True, dropout_rate=0.0,
        dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
    store.tables['tag_idx'] = rng.integers(0, N_TAGS, N_ITEMS).astype(np.int32)
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

    scorer = CatalogScorer(model, variables, store,
                           item_chunk=8192, user_chunk=N_USERS)
    assert scorer._head is not None
    item_first = scorer._item_fast[0]
    C = scorer.item_chunk
    num_chunks = item_first.shape[0] // C
    TB, TC = scorer.tile_users, scorer.tile_items
    head = scorer._head

    users = jnp.asarray(rng.integers(0, 4096, N_USERS).astype(np.int32))
    seen = jnp.zeros((N_USERS, 0), jnp.int32)

    @jax.jit
    def scores_only(variables, item_first, user_idx):
        user_emb = model.apply(variables, user_idx, method='user_tower')
        uf = compute_user_first(head, user_emb)
        chunks = item_first.reshape(num_chunks, C, item_first.shape[-1])

        def body(acc, chunk):
            s = pallas_pairwise_scores(head, uf, chunk,
                                       tile_users=TB, tile_items=TC)
            return acc + jnp.sum(s, axis=1), None

        acc, _ = jax.lax.scan(body, jnp.zeros(N_USERS, jnp.float32), chunks)
        return acc

    def timed(label, fn, fetch):
        fetch(fn())  # compile + warm
        rates = []
        for _ in range(3):
            t0 = time.time()
            fetch(fn())
            dt = time.time() - t0
            rates.append(N_USERS * N_ITEMS / dt)
        r = float(np.median(rates))
        log(f"{label}: {r / 1e6:.1f}M pairs/s "
            f"({[f'{x / 1e6:.0f}M' for x in rates]})")
        print(json.dumps({'metric': f'profile_{label}',
                          'value': round(r, 1), 'unit': 'pairs/sec/chip'}),
              flush=True)
        return r

    timed('scores_only',
          lambda: scores_only(scorer.variables, item_first, users),
          lambda x: float(np.asarray(x)[0]))
    timed('topk_k1',
          lambda: scorer._topk_scan_fast(scorer.variables, scorer._item_fast,
                                         users, seen, 1),
          lambda x: float(np.asarray(x[0])[0, 0]))
    timed('topk_full',
          lambda: scorer._topk_scan_fast(scorer.variables, scorer._item_fast,
                                         users, seen, 50),
          lambda x: float(np.asarray(x[0])[0, 0]))


if __name__ == '__main__':
    main()
