#!/usr/bin/env python
"""Two-stage cascaded attention top-K on hardware (ops/attention_cascade).

Measures, at the flagship bench geometry (65k catalog, 2048/384 towers,
[512,256,128] head, attention fusion H=4):

  * exact full-scan top-K rate (gram kernel — the 48M pairs/s baseline),
  * screen-only full-catalog top-C rate (the cheap token-0-exact kernel),
  * cascade end-to-end top-K wall (screen + exact rescore) -> EFFECTIVE
    pairs/s (n_users * n_items / wall), the number that compares against
    the exact scan,
  * measured screen recall@C vs the exact top-K (the cascade's
    correctness condition), and top-K agreement of the cascade output.

Usage: python scripts/bench_cascade.py [n_users] [n_candidates]
Prints one JSON line per measurement on stdout.
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


def main():
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
    from pixelrec_multimodal_tpu.models.multimodal import (
        MultimodalRecommender,
    )

    log(f"devices: {jax.devices()}")
    model = MultimodalRecommender(
        n_users=65536, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUM_FEAT, embedding_dim=EMB,
        vision_feature_dim=VISION_DIM, language_feature_dim=LANG_DIM,
        use_contrastive=False, fusion_hidden_dims=HIDDEN,
        fusion_type='attention', num_attention_heads=4,
        use_batch_norm=True, dropout_rate=0.0, dtype=jnp.bfloat16)

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

    t0 = time.time()
    scorer = CatalogScorer(model, variables, store)
    log(f"tower+tables build: {time.time() - t0:.1f}s; "
        f"variant={scorer.attention_variant} "
        f"tiles {scorer.tile_users}x{scorer.tile_items} "
        f"screen {scorer.screen_tile_users}x{scorer.screen_tile_items}")
    users = rng.integers(0, 65536, n_users).astype(np.int32)

    results = {}

    # --- exact full scan (baseline)
    t0 = time.time()
    ev, ei = scorer.top_k(users[:scorer.user_chunk], TOP_K)
    log(f"exact compile+first block: {time.time() - t0:.1f}s")
    rates = []
    for r in range(3):
        t0 = time.time()
        ev, ei = scorer.top_k(users, TOP_K)
        dt = time.time() - t0
        rates.append(n_users * N_ITEMS / dt)
        log(f"exact run {r + 1}: {dt:.2f}s -> {rates[-1]:,.0f} pairs/s")
    results['exact'] = float(np.median(rates))

    k_sets = [set(row[row >= 0].tolist()) for row in ei]

    for tier, flag in (('token0', True), ('additive', 'additive')):
        # --- screen-only top-C scan
        if tier == 'additive':
            scorer._ensure_screen_additive()
        else:
            scorer._ensure_screen()
        t0 = time.time()
        scorer.top_k(users[:scorer.user_chunk], n_cand, _screen=flag)
        log(f"{tier} screen compile+first block: {time.time() - t0:.1f}s")
        rates = []
        for r in range(3):
            t0 = time.time()
            sv, si = scorer.top_k(users, n_cand, _screen=flag)
            dt = time.time() - t0
            rates.append(n_users * N_ITEMS / dt)
            log(f"{tier} screen run {r + 1}: {dt:.2f}s -> "
                f"{rates[-1]:,.0f} pairs/s")
        results[f'screen_{tier}'] = float(np.median(rates))

        # --- measured recall@C on this user population
        for cc in (128, 256, n_cand):
            hits = sum(len(ks & set(si[b, :cc].tolist()))
                       for b, ks in enumerate(k_sets))
            total = sum(len(ks) for ks in k_sets)
            results[f'recall_{tier}_at_{cc}'] = hits / max(total, 1)
            log(f"{tier} screen recall@{cc} (k={TOP_K}): "
                f"{results[f'recall_{tier}_at_{cc}']:.4f}")

        # --- cascade end-to-end
        t0 = time.time()
        scorer.top_k_cascade(users[:scorer.user_chunk], TOP_K,
                             n_candidates=n_cand, screen=tier)
        log(f"{tier} cascade compile+first block: {time.time() - t0:.1f}s")
        rates = []
        for r in range(3):
            t0 = time.time()
            cv, ci = scorer.top_k_cascade(users, TOP_K, n_candidates=n_cand,
                                          screen=tier)
            dt = time.time() - t0
            rates.append(n_users * N_ITEMS / dt)
            log(f"{tier} cascade run {r + 1}: {dt:.2f}s -> "
                f"{rates[-1]:,.0f} effective pairs/s")
        results[f'cascade_effective_{tier}'] = float(np.median(rates))

        # top-K set agreement of the cascade vs the exact scan
        agree = np.mean([len(set(ci[b][ci[b] >= 0].tolist()) & ks)
                         / max(len(ks), 1)
                         for b, ks in enumerate(k_sets)])
        results[f'topk_agreement_{tier}'] = float(agree)
        log(f"{tier} cascade top-{TOP_K} agreement: {agree:.4f}")

    for name in sorted(results):
        if name.startswith('recall'):
            continue
        if name.startswith('topk_agreement'):
            continue
        print(json.dumps({
            'metric': f'attention_topk_pairs_per_sec_{name}',
            'value': round(results[name], 1), 'unit': 'pairs/sec/chip'}),
            flush=True)
    print(json.dumps({
        'metric': 'attention_cascade_quality',
        'n_candidates': n_cand, 'k': TOP_K,
        'recall': {k: round(v, 4) for k, v in results.items()
                   if k.startswith('recall')},
        'topk_agreement': {k: round(v, 4) for k, v in results.items()
                           if k.startswith('topk_agreement')}}), flush=True)


if __name__ == '__main__':
    main()
