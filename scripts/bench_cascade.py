#!/usr/bin/env python
"""Two-stage cascaded attention top-K on hardware (ops/attention_cascade).

Measures, at the flagship bench geometry (65k catalog, 2048/384 towers,
[512,256,128] head, attention fusion H=4), on a TRAINED model (planted
latent structure, a few compiled epochs — recall numbers on a random-init
model are meaningless because its score surface is unstructured):

  * exact full-scan top-K rate (gram kernel — the ~48M pairs/s baseline),
  * per screen tier, AT ITS OWN DEFAULT C (token0 max(8k,256), additive
    max(16k,1024) — ADVICE r4: benching additive below its floor
    understates it):
      - screen-only full-catalog top-C rate,
      - measured screen recall@C vs the exact top-K over a calibration
        grid (the cascade's correctness condition),
      - cascade end-to-end top-K wall (screen + exact rescore) ->
        EFFECTIVE pairs/s (n_users * n_items / wall), the number that
        compares against the exact scan,
      - top-K agreement of the cascade output vs the exact scan,
  * the auto_cascade production path: calibrate-and-install on a user
    sample, then the routed ``top_k`` effective rate.

Usage: python scripts/bench_cascade.py [n_users] [--raw] [--epochs N]
  --raw skips training (random init; screen rates still valid, recall
  numbers are then only a structural smoke check).
Prints one JSON line per measurement on stdout.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_USERS_TOTAL = 65536
N_ITEMS = 65536
N_TAGS = 64
EMB = 64
VISION_DIM = 2048
LANG_DIM = 384
NUM_FEAT = 7
HIDDEN = (512, 256, 128)
TOP_K = 50
LATENT = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_store(rng, v_lat):
    """Item feature tables carrying the planted latent structure."""
    from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
    store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
    store.tables['tag_idx'] = rng.integers(0, N_TAGS, N_ITEMS).astype(np.int32)
    pv = rng.standard_normal((LATENT, VISION_DIM)).astype(np.float32)
    pl_ = rng.standard_normal((LATENT, LANG_DIM)).astype(np.float32)
    pn = rng.standard_normal((LATENT, NUM_FEAT)).astype(np.float32)
    store.tables['vision_emb'] = (
        v_lat @ pv + 0.3 * rng.standard_normal(
            (N_ITEMS, VISION_DIM))).astype(np.float32)
    store.tables['language_emb'] = (
        v_lat @ pl_ + 0.3 * rng.standard_normal(
            (N_ITEMS, LANG_DIM))).astype(np.float32)
    store.tables['numerical'] = (
        v_lat @ pn + 0.3 * rng.standard_normal(
            (N_ITEMS, NUM_FEAT))).astype(np.float32)
    return store


def train(model, store, u_lat, v_lat, rng, epochs: int, batch: int = 8192,
          steps_per_epoch: int = 64):
    """A few compiled whole-epoch scans on planted-structure interactions
    (positives = argmax-affinity item of a random candidate draw)."""
    import jax
    import jax.numpy as jnp
    import optax
    from pixelrec_multimodal_tpu.training.steps import (
        init_train_state,
        make_step_fns,
    )

    n = epochs * steps_per_epoch * batch
    users = rng.integers(0, N_USERS_TOTAL, n).astype(np.int32)
    items = np.empty(n, np.int32)
    labels = np.empty(n, np.float32)
    pos = n // 2
    cand = rng.integers(0, N_ITEMS, (pos, 32))
    aff = np.einsum('nl,ncl->nc', u_lat[users[:pos]], v_lat[cand])
    items[:pos] = cand[np.arange(pos), aff.argmax(1)]
    labels[:pos] = 1.0
    items[pos:] = rng.integers(0, N_ITEMS, n - pos)
    labels[pos:] = 0.0
    perm = rng.permutation(n)
    users, items, labels = users[perm], items[perm], labels[perm]

    tables = {k: jnp.asarray(v) for k, v in store.tables.items()
              if k != 'tag_idx'}
    tag = jnp.asarray(store.tables['tag_idx'])
    tables['tag_idx'] = tag

    state = init_train_state(model, optax.adamw(1e-3),
                             jax.random.PRNGKey(0))
    _, _, train_epoch, _ = make_step_fns(model, tables,
                                         return_epoch_fns=True)
    spe = steps_per_epoch
    for e in range(epochs):
        s = e * spe * batch
        batches = {
            'user_idx': jnp.asarray(
                users[s:s + spe * batch].reshape(spe, batch)),
            'item_idx': jnp.asarray(
                items[s:s + spe * batch].reshape(spe, batch)),
            'tag_idx': jnp.asarray(np.asarray(tag)[
                items[s:s + spe * batch]].reshape(spe, batch)),
            'label': jnp.asarray(
                labels[s:s + spe * batch].reshape(spe, batch)),
        }
        t0 = time.time()
        state, metrics = train_epoch(state, batches, jax.random.PRNGKey(e))
        loss = float(np.mean(np.asarray(metrics['total_loss'])))
        log(f"train epoch {e + 1}/{epochs}: loss {loss:.4f} "
            f"({time.time() - t0:.1f}s)")
    variables = {'params': state.params}
    if state.batch_stats is not None:
        variables['batch_stats'] = state.batch_stats
    return variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('n_users', nargs='?', type=int, default=8192)
    ap.add_argument('--raw', action='store_true',
                    help='skip training (random-init model)')
    ap.add_argument('--epochs', type=int, default=3)
    args = ap.parse_args()
    n_users = args.n_users

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

    if args.raw:
        B = 8
        variables = model.init(
            {'params': jax.random.PRNGKey(0)},
            jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32),
            vision_features=jnp.zeros((B, VISION_DIM), jnp.float32),
            language_features=jnp.zeros((B, LANG_DIM), jnp.float32),
            numerical_features=jnp.zeros((B, NUM_FEAT), jnp.float32),
            train=False)
    else:
        t0 = time.time()
        variables = train(model, store, u_lat, v_lat, rng, args.epochs)
        log(f"training total: {time.time() - t0:.1f}s")

    t0 = time.time()
    scorer = CatalogScorer(model, variables, store)
    log(f"tower+tables build: {time.time() - t0:.1f}s; "
        f"variant={scorer.attention_variant} "
        f"tiles {scorer.tile_users}x{scorer.tile_items} "
        f"screen {scorer.screen_tile_users}x{scorer.screen_tile_items}")
    users = rng.integers(0, N_USERS_TOTAL, n_users).astype(np.int32)

    results = {}
    quality = {}

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

    # Per-tier defaults (top_k_cascade's own): the ADVICE-r4 fix — bench
    # each tier at its operating point, not both at one C.
    tier_c = {'token0': max(8 * TOP_K, 256),
              'additive': max(16 * TOP_K, 1024)}
    grid = (128, 256, 512, 1024, 2048)

    for tier, flag in (('token0', True), ('additive', 'additive')):
        n_cand = tier_c[tier]
        if tier == 'additive':
            scorer._ensure_screen_additive()
        else:
            scorer._ensure_screen()
        # --- screen-only top-C scan at the tier's default C
        t0 = time.time()
        scorer.top_k(users[:scorer.user_chunk], n_cand, _screen=flag)
        log(f"{tier} screen compile+first block: {time.time() - t0:.1f}s")
        rates = []
        for r in range(3):
            t0 = time.time()
            sv, si = scorer.top_k(users, n_cand, _screen=flag)
            dt = time.time() - t0
            rates.append(n_users * N_ITEMS / dt)
            log(f"{tier} screen run {r + 1} (C={n_cand}): {dt:.2f}s -> "
                f"{rates[-1]:,.0f} pairs/s")
        results[f'screen_{tier}'] = float(np.median(rates))

        # --- measured recall@C over the calibration grid (one wide
        # screen pass; recall@C is a prefix property)
        _, sg = scorer.top_k(users, max(grid), _screen=flag)
        for cc in sorted(set(grid) | {n_cand}):
            hits = sum(len(ks & set(sg[b, :cc].tolist()))
                       for b, ks in enumerate(k_sets))
            total = sum(len(ks) for ks in k_sets)
            quality[f'recall_{tier}_at_{cc}'] = hits / max(total, 1)
            log(f"{tier} screen recall@{cc} (k={TOP_K}): "
                f"{quality[f'recall_{tier}_at_{cc}']:.4f}")

        # --- cascade end-to-end at the tier's default C
        t0 = time.time()
        scorer.top_k_cascade(users[:scorer.user_chunk], TOP_K, screen=tier)
        log(f"{tier} cascade compile+first block: {time.time() - t0:.1f}s")
        rates = []
        for r in range(3):
            t0 = time.time()
            cv, ci = scorer.top_k_cascade(users, TOP_K, screen=tier)
            dt = time.time() - t0
            rates.append(n_users * N_ITEMS / dt)
            log(f"{tier} cascade run {r + 1} (C={n_cand}): {dt:.2f}s -> "
                f"{rates[-1]:,.0f} effective pairs/s")
        results[f'cascade_effective_{tier}'] = float(np.median(rates))

        agree = np.mean([len(set(ci[b][ci[b] >= 0].tolist()) & ks)
                         / max(len(ks), 1)
                         for b, ks in enumerate(k_sets)])
        quality[f'topk_agreement_{tier}'] = float(agree)
        log(f"{tier} cascade top-{TOP_K} agreement (C={n_cand}): "
            f"{agree:.4f}")

    # --- 3-stage funnel cascade (additive screen -> token0 candidate
    # screen -> exact rescore): the recall-1.0 tier at the additive
    # tier's scan rate (probe_funnel_recall.py measured additive
    # recall@8192 = 1.0 with the token0 stage losing nothing)
    t0 = time.time()
    rec_f = scorer.calibrate_funnel(users[:512], TOP_K,
                                    c1_grid=(2048, 4096, 8192),
                                    c2_grid=(256, 512, 1024))
    log(f"funnel calibration ({time.time() - t0:.1f}s):")
    for (c1, c2), r in sorted(rec_f.items()):
        quality[f'recall_funnel_{c1}_{c2}'] = r
        log(f"  funnel recall c1={c1} c2={c2}: {r:.4f}")
    for c1, c2 in ((8192, 512), (4096, 512)):
        t0 = time.time()
        scorer.top_k_cascade(users[:scorer.user_chunk], TOP_K,
                             n_candidates=c2, screen='funnel',
                             funnel_c1=c1)
        log(f"funnel compile+first block (C1={c1}, C2={c2}): "
            f"{time.time() - t0:.1f}s")
        rates = []
        for r in range(3):
            t0 = time.time()
            cv, ci = scorer.top_k_cascade(users, TOP_K, n_candidates=c2,
                                          screen='funnel', funnel_c1=c1)
            dt = time.time() - t0
            rates.append(n_users * N_ITEMS / dt)
            log(f"funnel run {r + 1} (C1={c1}, C2={c2}): {dt:.2f}s -> "
                f"{rates[-1]:,.0f} effective pairs/s")
        results[f'cascade_effective_funnel_{c1}_{c2}'] = float(
            np.median(rates))
        agree = np.mean([len(set(ci[b][ci[b] >= 0].tolist()) & ks)
                         / max(len(ks), 1)
                         for b, ks in enumerate(k_sets)])
        quality[f'topk_agreement_funnel_{c1}_{c2}'] = float(agree)
        log(f"funnel top-{TOP_K} agreement (C1={c1}, C2={c2}): "
            f"{agree:.4f}")

    # --- auto_cascade: the production path (calibrate on a sample,
    # install the plan, route top_k)
    t0 = time.time()
    plan = scorer.auto_cascade(
        np.arange(N_USERS_TOTAL, dtype=np.int32), TOP_K)
    log(f"auto_cascade calibration: {time.time() - t0:.1f}s -> {plan}")
    if plan is not None:
        quality['auto_plan'] = {k: (v if isinstance(v, str) else float(v))
                                for k, v in plan.items()}
        rates = []
        for r in range(3):
            t0 = time.time()
            av, ai = scorer.top_k(users, TOP_K)  # routed
            dt = time.time() - t0
            rates.append(n_users * N_ITEMS / dt)
            log(f"auto-cascade top_k run {r + 1}: {dt:.2f}s -> "
                f"{rates[-1]:,.0f} effective pairs/s")
        results['cascade_effective_auto'] = float(np.median(rates))
        agree = np.mean([len(set(ai[b][ai[b] >= 0].tolist()) & ks)
                         / max(len(ks), 1)
                         for b, ks in enumerate(k_sets)])
        quality['topk_agreement_auto'] = float(agree)
        log(f"auto-cascade top-{TOP_K} agreement: {agree:.4f}")

    for name in sorted(results):
        print(json.dumps({
            'metric': f'attention_topk_pairs_per_sec_{name}',
            'value': round(results[name], 1), 'unit': 'pairs/sec/chip'}),
            flush=True)
    print(json.dumps({
        'metric': 'attention_cascade_quality',
        'trained': not args.raw, 'k': TOP_K, 'tier_default_c': tier_c,
        'recall': {k: round(v, 4) for k, v in quality.items()
                   if k.startswith('recall')},
        'topk_agreement': {k: round(v, 4) for k, v in quality.items()
                           if k.startswith('topk_agreement')},
        'auto_plan': quality.get('auto_plan')}), flush=True)


if __name__ == '__main__':
    main()
