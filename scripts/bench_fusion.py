#!/usr/bin/env python
"""Full-catalog scoring throughput for the NON-concatenate fusion paths.

bench.py's headline covers concatenate fusion (the factorized/Pallas fast
path). This measures attention and gated fusion through the generic
``_score_block`` scan (inference/scorer.py) — the path the reference runs
per 256-item batch on host (/root/reference/src/inference/recommender.py:96)
— so BASELINE.md can record all three fusion types on hardware.

Usage: python scripts/bench_fusion.py [attention|gated|concatenate] [n_users]
Prints one JSON line per run on stdout.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fusion_type: str, n_users: int, item_chunk: int = 0,
          user_chunk: int = 0, fast_path: bool = True,
          tile_users: int = 0, tile_items: int = 0) -> float:
    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
    from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender

    log(f"devices: {jax.devices()}; fusion={fusion_type}")
    model = MultimodalRecommender(
        n_users=4096, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUM_FEAT, embedding_dim=EMB,
        vision_feature_dim=VISION_DIM, language_feature_dim=LANG_DIM,
        use_contrastive=False, fusion_hidden_dims=HIDDEN,
        fusion_type=fusion_type, use_batch_norm=True, dropout_rate=0.0,
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

    tile_kw = {}
    if tile_users:
        tile_kw['tile_users'] = tile_users
    if tile_items:
        tile_kw['tile_items'] = tile_items
    if item_chunk:
        tile_kw['item_chunk'] = item_chunk
    if user_chunk:
        tile_kw['user_chunk'] = user_chunk
    scorer = CatalogScorer(model, variables, store, fast_path=fast_path,
                           **tile_kw)
    log(f"tiles: {scorer.tile_users}x{scorer.tile_items} "
        f"chunks: {scorer.item_chunk}/{scorer.user_chunk}")
    log(f"fast path active: {scorer._head is not None}")
    users = rng.integers(0, 4096, n_users).astype(np.int32)

    t0 = time.time()
    scorer.top_k(users[:min(len(users), scorer.user_chunk)], TOP_K)
    log(f"compile+first block: {time.time() - t0:.1f}s")

    rates = []
    for r in range(3):
        t0 = time.time()
        scorer.top_k(users, TOP_K)
        dt = time.time() - t0
        rates.append(n_users * N_ITEMS / dt)
        log(f"run {r + 1}: {dt:.2f}s -> {rates[-1]:,.0f} pairs/s")
    return float(np.median(rates))


def main():
    args = [a for a in sys.argv[1:] if a != '--generic']
    fast_path = '--generic' not in sys.argv
    fusion = args[0] if args else 'gated'
    n_users = int(args[1]) if len(args) > 1 else 256
    tile_users = int(args[2]) if len(args) > 2 else 0
    tile_items = int(args[3]) if len(args) > 3 else 0
    pps = bench(fusion, n_users, fast_path=fast_path,
                tile_users=tile_users, tile_items=tile_items)
    suffix = '' if fast_path else '_generic'
    print(json.dumps({
        'metric': f'full_catalog_topk_pairs_per_sec_{fusion}{suffix}',
        'value': round(pps, 1), 'unit': 'pairs/sec/chip'}), flush=True)


if __name__ == '__main__':
    main()
