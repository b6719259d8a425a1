#!/usr/bin/env python
"""Feasibility probe for the 3-stage FUNNEL cascade (additive -> token0
-> exact rescore): measures the composed screen recall on the trained
flagship model WITHOUT building the funnel path.

The funnel keeps an exact-top-k item iff
  (a) it survives the additive screen's top-C1 over the catalog, and
  (b) its token0 rank WITHIN those C1 survivors is < C2.
Both are computable from the two existing full-catalog screen rankings:
restriction preserves relative token0 order, so rank-within-survivors of
item x = #{survivors with better global token0 score than x}. Two wide
screen passes (depth D) therefore yield funnel recall for every
(C1 <= D, C2 <= C1) pair at once.

Also reports the single-tier recalls at large C (the additive tier was
only calibrated to C=2048 in BASELINE.md — whether it reaches 1.0 by
C=8192 decides if the funnel can be a recall-1.0 tier).

Usage: python scripts/probe_funnel_recall.py [n_users] [--epochs N]
                                             [--depth D]
Prints one JSON line on stdout.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_cascade import (  # noqa: E402
    EMB, HIDDEN, LANG_DIM, LATENT, N_ITEMS, N_TAGS, N_USERS_TOTAL,
    NUM_FEAT, TOP_K, VISION_DIM, log, make_store, train,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('n_users', nargs='?', type=int, default=2048)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--depth', type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
    from pixelrec_multimodal_tpu.models.multimodal import (
        MultimodalRecommender,
    )

    log(f"devices: {jax.devices()}")
    model = MultimodalRecommender(
        n_users=N_USERS_TOTAL, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUM_FEAT, embedding_dim=EMB,
        vision_feature_dim=VISION_DIM, language_feature_dim=LANG_DIM,
        use_contrastive=False, fusion_hidden_dims=HIDDEN,
        fusion_type='attention', num_attention_heads=4,
        use_batch_norm=True, dropout_rate=0.0, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    u_lat = rng.standard_normal((N_USERS_TOTAL, LATENT)).astype(np.float32)
    v_lat = rng.standard_normal((N_ITEMS, LATENT)).astype(np.float32)
    store = make_store(rng, v_lat)
    t0 = time.time()
    variables = train(model, store, u_lat, v_lat, rng, args.epochs)
    log(f"training total: {time.time() - t0:.1f}s")

    scorer = CatalogScorer(model, variables, store)
    users = rng.integers(0, N_USERS_TOTAL, args.n_users).astype(np.int32)
    D = args.depth

    scorer._ensure_screen_additive()

    t0 = time.time()
    _, ei = scorer.top_k(users, TOP_K)
    log(f"exact top-{TOP_K}: {time.time() - t0:.1f}s")
    t0 = time.time()
    _, ai = scorer.top_k(users, D, _screen='additive')
    log(f"additive screen top-{D}: {time.time() - t0:.1f}s")
    t0 = time.time()
    _, ti = scorer.top_k(users, D, _screen=True)
    log(f"token0 screen top-{D}: {time.time() - t0:.1f}s")

    c1_grid = [c for c in (1024, 2048, 4096, 8192) if c <= D]
    c2_grid = [c for c in (256, 512, 1024, 2048) if c <= D]
    out = {'n_users': args.n_users, 'depth': D, 'k': TOP_K}

    # single-tier recalls at large C (prefix property of one ranking)
    for name, si in (('additive', ai), ('token0', ti)):
        for cc in c1_grid:
            hits = total = 0
            for b in range(len(ei)):
                ks = set(ei[b][ei[b] >= 0].tolist())
                if not ks:
                    continue
                hits += len(ks & set(si[b, :cc].tolist()))
                total += len(ks)
            out[f'recall_{name}_at_{cc}'] = round(hits / max(total, 1), 5)

    # funnel recall: additive rank < C1 AND token0-rank-within-survivors
    # < C2. token0 global ranks beyond depth D are treated as infinity
    # (pessimistic for the funnel — an item outside token0's global
    # top-D could still make C2 within a small survivor set; the probe
    # under-reports, never over-reports). Vectorized: per user, the
    # within-rank of an exact item with token0 global rank t equals
    # #{survivor prefix entries with smaller t} (searchsorted on the
    # sorted prefix).
    hits = {(c1, c2): 0 for c1 in c1_grid for c2 in c2_grid if c2 <= c1}
    total = 0
    for b in range(len(ei)):
        ks = np.asarray([i for i in ei[b].tolist() if i >= 0], np.int64)
        if not len(ks):
            continue
        total += len(ks)
        a_rank = np.full(N_ITEMS, D, np.int32)
        a_rank[ai[b]] = np.arange(D, dtype=np.int32)
        t_rank = np.full(N_ITEMS, D, np.int32)
        t_rank[ti[b]] = np.arange(D, dtype=np.int32)
        surv_t = t_rank[ai[b]]            # token0 rank of each survivor
        ks_a, ks_t = a_rank[ks], t_rank[ks]
        for c1 in c1_grid:
            prefix = np.sort(surv_t[:c1])
            within = np.searchsorted(prefix, ks_t, side='left')
            alive = (ks_a < c1) & (ks_t < D)
            for c2 in c2_grid:
                if c2 > c1:
                    continue
                hits[(c1, c2)] += int(np.sum(alive & (within < c2)))
    for (c1, c2), h in hits.items():
        out[f'recall_funnel_c1_{c1}_c2_{c2}'] = round(h / max(total, 1), 5)

    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
