#!/usr/bin/env python
"""int8 scoring head vs exact bf16 at the flagship bench geometry.

Measures, on the real TPU, what BASELINE.md's int8 section reports:
  * full-catalog top-K pairs/s for the exact (bf16) and int8 scorers
    at the headline geometry (65k catalog, 2048/384 towers,
    [512,256,128] head, 8192-user blocks, top-50);
  * ranking fidelity: top-50 set agreement and top-10 exact-order
    agreement of int8 vs exact over the measured user block.

Run from /root/repo with PYTHONPATH unset (axon):
    python scripts/bench_int8.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITEMS = 65536
N_USERS = 8192
TOP_K = 50
EMB = 64
VISION_DIM = 2048
LANG_DIM = 384
NUM_FEAT = 7
HIDDEN = (512, 256, 128)
N_TAGS = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    global HIDDEN
    ap = argparse.ArgumentParser()
    ap.add_argument('--hidden', type=str, default='512,256,128',
                    help='comma-separated prediction-MLP widths (flip-'
                         'point sweep: try 1024,512,256 / 2048,1024,512)')
    args = ap.parse_args()
    HIDDEN = tuple(int(x) for x in args.hidden.split(','))
    log(f"hidden dims: {HIDDEN}")
    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
    from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender

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

    key = jax.random.PRNGKey(0)
    B = 8
    variables = model.init(
        {'params': key}, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
        vision_features=jnp.zeros((B, VISION_DIM), jnp.float32),
        language_features=jnp.zeros((B, LANG_DIM), jnp.float32),
        numerical_features=jnp.zeros((B, NUM_FEAT), jnp.float32),
        train=False)
    users = rng.integers(0, 4096, N_USERS).astype(np.int32)

    results = {}
    topk = {}
    for name, kw in (('bf16', {}), ('int8', {'precision': 'int8!'})):
        scorer = CatalogScorer(model, variables, store, **kw)
        log(f"[{name}] warmup/compile...")
        t0 = time.time()
        scorer.top_k(users[:scorer.user_chunk], TOP_K)
        log(f"[{name}] compile+first batch: {time.time() - t0:.1f}s")
        rates = []
        for r in range(3):
            t0 = time.time()
            v, i = scorer.top_k(users, TOP_K)
            dt = time.time() - t0
            rates.append(N_USERS * N_ITEMS / dt)
            log(f"[{name}] run {r}: {dt:.2f}s  {rates[-1]/1e6:.1f}M pairs/s")
        results[name] = float(np.median(rates))
        topk[name] = (np.asarray(v), np.asarray(i))

    # Ranking fidelity over the measured block.
    i_e, i_q = topk['bf16'][1], topk['int8'][1]
    set_agree = np.mean([len(set(a) & set(b)) / TOP_K
                         for a, b in zip(i_e, i_q)])
    order10 = np.mean((i_e[:, :10] == i_q[:, :10]).all(axis=1))
    log(f"top-{TOP_K} set agreement: {set_agree:.4f}")
    log(f"top-10 exact-order agreement: {order10:.4f}")
    log(f"bf16 median: {results['bf16']/1e6:.1f}M pairs/s")
    log(f"int8 median: {results['int8']/1e6:.1f}M pairs/s "
        f"({results['int8']/results['bf16']:.2f}x)")
    print(f'{{"hidden": "{args.hidden}", '
          f'"bf16_mps": {results["bf16"]/1e6:.1f}, '
          f'"int8_mps": {results["int8"]/1e6:.1f}, '
          f'"top{TOP_K}_set_agreement": {set_agree:.4f}, '
          f'"top10_order_agreement": {order10:.4f}}}')


if __name__ == '__main__':
    main()
