"""At-scale full-catalog stress: 10^5-10^6-item catalogs on one chip.

VERDICT r2 #7: the catalog axis is this workload's long axis (SURVEY.md
§5.7) — PixelRec-scale catalogs are the design's stated motivation, but
round 2 only validated 20k items. This drives the PRODUCTION CatalogScorer
(streaming scan + factorized Pallas head + approx_max_k merges) at real
scale on the flagship geometry and reports wall-clock, steady-state
pairs/s, and the HBM residency accounting.

    python scripts/bench_scale.py [--n_items 200000] [--n_users 8192]

Prints ONE JSON line on stdout (diagnostics on stderr).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr)


def gb(nbytes):
    return nbytes / (1 << 30)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n_items', type=int, default=200_000)
    p.add_argument('--n_users', type=int, default=8192)
    p.add_argument('--k', type=int, default=50)
    p.add_argument('--blocks', type=int, default=2,
                   help='user blocks to time (steady state)')
    p.add_argument('--device', type=str, default=None,
                   help="JAX platform override (e.g. 'cpu' for smoke runs)")
    p.add_argument('--fusion', type=str, default='concatenate',
                   choices=['concatenate', 'gated', 'attention'])
    args = p.parse_args()

    import jax
    if args.device and args.device not in ('tpu', 'auto', 'cuda'):
        jax.config.update('jax_platforms', args.device)
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
    from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender

    n_items = args.n_items
    VIS, LANG, NUM = 2048, 384, 7
    log(f"catalog {n_items:,} items, flagship geometry "
        f"(vision {VIS}, language {LANG}, {NUM} numerical)")

    model = MultimodalRecommender(
        n_users=100_000, n_items=n_items, n_tags=32,
        num_numerical_features=NUM, embedding_dim=64,
        vision_feature_dim=VIS, language_feature_dim=LANG,
        use_contrastive=False, fusion_hidden_dims=(512, 256, 128),
        fusion_type=args.fusion, use_batch_norm=True, dropout_rate=0.0,
        dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    idx = jnp.zeros((2,), jnp.int32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0)}, idx, idx, idx,
        vision_features=jnp.zeros((2, VIS)),
        language_features=jnp.zeros((2, LANG)),
        numerical_features=jnp.zeros((2, NUM)), train=False)

    t0 = time.time()
    store = ItemFeatureStore(n_items, np.arange(n_items).astype(str))
    store.tables['tag_idx'] = (np.arange(n_items) % 32).astype(np.int32)
    # Host-resident raw tables (the production layout after precompute):
    # they stream through the chunked tower build and never stay in HBM.
    store.tables['vision_emb'] = rng.standard_normal(
        (n_items, VIS)).astype(np.float32)
    store.tables['language_emb'] = rng.standard_normal(
        (n_items, LANG)).astype(np.float32)
    store.tables['numerical'] = rng.standard_normal(
        (n_items, NUM)).astype(np.float32)
    log(f"host tables built in {time.time()-t0:.1f}s "
        f"(vision {gb(store.tables['vision_emb'].nbytes):.2f} GB, "
        f"language {gb(store.tables['language_emb'].nbytes):.2f} GB)")

    t0 = time.time()
    scorer = CatalogScorer(model, variables, store)
    jax.block_until_ready(scorer._item_feats)
    if scorer._item_fast is not None:
        jax.block_until_ready(scorer._item_fast)
    build_s = time.time() - t0

    resident = {'item_feats': scorer._item_feats.nbytes}
    if scorer._item_fast is not None:
        for i, a in enumerate(scorer._item_fast):
            resident[f'item_fast[{i}]'] = a.nbytes
    total_res = sum(resident.values())
    log(f"tower+fast build {build_s:.1f}s "
        f"(streamed via {scorer._TOWER_BUILD_CHUNK}-item chunks); "
        f"resident HBM: "
        + ", ".join(f"{k} {gb(v):.2f} GB" for k, v in resident.items())
        + f" => total {gb(total_res):.2f} GB "
        f"(raw tables would add {gb(store.tables['vision_emb'].nbytes + store.tables['language_emb'].nbytes):.2f} GB)")
    log(f"geometry: item_chunk {scorer.item_chunk}, user_chunk "
        f"{scorer.user_chunk}, n_pad {scorer.n_pad:,}")

    users = rng.integers(0, 100_000, args.n_users).astype(np.int32)
    # Cold call (compile + first run).
    t0 = time.time()
    v, i = scorer.top_k(users[:scorer.user_chunk], args.k)
    cold_s = time.time() - t0
    log(f"cold top-{args.k} block ({min(args.n_users, scorer.user_chunk)} "
        f"users): {cold_s:.1f}s")

    # Steady state: time --blocks full user blocks.
    nb = args.blocks
    t0 = time.time()
    for b in range(nb):
        v, i = scorer.top_k(users[:scorer.user_chunk], args.k)
    steady_s = (time.time() - t0) / nb
    assert np.isfinite(v).all() and (i >= 0).all()
    pairs = scorer.user_chunk * n_items
    rate = pairs / steady_s
    log(f"steady: {steady_s:.2f}s per {scorer.user_chunk}-user block "
        f"=> {rate/1e6:.1f}M pairs/s")

    full_wall = steady_s * (args.n_users / scorer.user_chunk)
    log(f"full {args.n_users:,}-user x {n_items:,}-item catalog pass: "
        f"{full_wall:.1f}s projected from steady blocks")

    print(json.dumps({
        'metric': 'at_scale_full_catalog_topk',
        'fusion': args.fusion,
        'n_items': n_items, 'n_users_block': scorer.user_chunk,
        'pairs_per_sec': round(rate, 1),
        'steady_block_s': round(steady_s, 3),
        'cold_block_s': round(cold_s, 1),
        'tower_build_s': round(build_s, 1),
        'resident_hbm_gb': round(gb(total_res), 3),
    }))


if __name__ == '__main__':
    main()
