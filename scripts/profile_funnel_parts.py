#!/usr/bin/env python
"""Component breakdown of the 3-stage funnel cascade wall on TPU.

The round-5 funnel measurement (bench_cascade.py) put the recall-1.0
operating point (C1=8192) at 16.7s end-to-end — WORSE than the 11.2s
exact scan despite the screen kernel itself costing ~1.3s. This
profiler separates the binder, warm-state, at the flagship geometry
(random init — rates are weight-independent):

  * additive screen scan + top-C1 selection at C1 in {1024, 4096, 8192}
    (what _funnel_block's stage 1 pays),
  * the token0 candidate screen over gathered survivors at
    [B, C1] in {4096, 8192} (stage 2),
  * the exact rescore at C2=512 (stage 3),
  * raw selection primitives at stage-1 sizes: per-chunk
    approx_max_k(k, recall) and the final merge top_k.

Usage: python scripts/profile_funnel_parts.py [n_users]
One JSON line per measurement.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_cascade import (  # noqa: E402
    EMB, HIDDEN, LANG_DIM, N_ITEMS, N_TAGS, N_USERS_TOTAL, NUM_FEAT,
    VISION_DIM, log, make_store,
)

TOP_K = 50


def timed(label, fn, runs=3):
    fn()  # compile / warm
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    log(f"{label}: {dt:.3f}s")
    print(json.dumps({'metric': f'funnel_part_{label}',
                      'value': round(dt, 4), 'unit': 's'}), flush=True)
    return dt


def main():
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

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
    v_lat = rng.standard_normal((N_ITEMS, 16)).astype(np.float32)
    store = make_store(rng, v_lat)
    B = 8
    variables = model.init(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
        vision_features=jnp.zeros((B, VISION_DIM), jnp.float32),
        language_features=jnp.zeros((B, LANG_DIM), jnp.float32),
        numerical_features=jnp.zeros((B, NUM_FEAT), jnp.float32),
        train=False)
    scorer = CatalogScorer(model, variables, store)
    scorer._ensure_screen_additive()
    users = rng.integers(0, N_USERS_TOTAL, n_users).astype(np.int32)

    # stage 1: additive screen scan + selection at C1
    for c1 in (1024, 4096, 8192):
        timed(f'stage1_additive_top{c1}',
              lambda c1=c1: scorer.top_k(users, c1, _screen='additive'))

    # stage 2: gathered token0 candidate screen at [B, C1]
    for c1 in (4096, 8192):
        cand = rng.integers(0, N_ITEMS, (n_users, c1)).astype(np.int32)
        timed(f'stage2_candidate_screen_c{c1}',
              lambda cand=cand: scorer._screen_candidate_blocks(users, cand))

    # stage 3: exact rescore at C2
    cand = rng.integers(0, N_ITEMS, (n_users, 512)).astype(np.int32)
    timed('stage3_rescore_c512',
          lambda: scorer._rescore_blocks(users, cand))

    # raw selection primitives at stage-1 sizes
    C = scorer.item_chunk
    scores = jnp.asarray(rng.standard_normal((n_users, C)), jnp.float32)

    for k in (2048, 4096, 8192):
        for recall in (0.95, 0.8):
            @jax.jit
            def f(s, k=k, recall=recall):
                v, i = jax.lax.approx_max_k(s, k, recall_target=recall)
                return v[:, ::257].sum() + i[:, ::257].sum()

            timed(f'approx_k{k}_r{int(recall * 100)}_n{C}',
                  lambda f=f: float(f(scores)))

    cat = jnp.asarray(rng.standard_normal((n_users, 16384)), jnp.float32)

    @jax.jit
    def merge(s):
        v, i = jax.lax.top_k(s, 8192)
        return v[:, ::257].sum() + i[:, ::257].sum()

    timed('merge_sort_16384_to_8192', lambda: float(merge(cat)))

    @jax.jit
    def merge_approx(s):
        v, i = jax.lax.approx_max_k(s, 8192, recall_target=0.95)
        return v[:, ::257].sum() + i[:, ::257].sum()

    timed('merge_approx_16384_to_8192', lambda: float(merge_approx(cat)))


if __name__ == '__main__':
    main()
