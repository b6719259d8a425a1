#!/usr/bin/env python
"""Frozen-path training roofline decomposition.

bench_training.py measures the frozen path (feature-table gathers + ID
embeddings + projections + MLP head, the whole epoch as one compiled
scan) at ~4.4M samples/s. That headline has no %-of-roofline accounting
— this profiler supplies it, the same way profile_e2e_roofline.py did
for the unfrozen path: ablated epoch variants at the production
geometry, XLA compiled-cost FLOPs/bytes, and derived compute/HBM bounds.

Variants (all whole-epoch scans — the ~31ms fixed dispatch amortizes
over NB x BATCH samples, and reps are pipelined with one end fetch,
mirroring the bench protocol):

  full          production train_epoch (the bench's number)
  no_dropout    dropout_rate=0 (isolates threefry + mask cost)
  no_bn         use_batch_norm=False (isolates the BN cross-batch stats)
  fwd_only      eval_epoch (no grad, no optimizer)
  gather_only   feature gathers + reduce (the HBM random-gather term)
  opt_only      tx.update + apply_updates on fixed grads (dense AdamW
                sweep over every embedding row per step — torch parity
                semantics, reference trainer.py:397)

Reference anchor: the loop this replaces is
/root/reference/src/training/trainer.py:326-439.

Prints a stderr table + one JSON document on stdout.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITEMS = 65536
N_USERS = 4096
N_TAGS = 64
EMB = 64
VISION_DIM = 2048
LANG_DIM = 384
NUM_FEAT = 7
HIDDEN = (512, 256, 128)
BATCH = 32768
NB = 16                    # batches per epoch scan
REPS = 3
V5E_PEAK_TFLOPS = 159.0    # measured square-matmul bf16 peak (BASELINE.md)
V5E_HBM = 819e9            # bytes/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _ca(jitted, *args):
    """XLA compiled cost analysis (flops, bytes accessed) or Nones."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get('flops', 0.0)),
                float(ca.get('bytes accessed', 0.0)))
    except Exception as e:  # remote clients may not expose it
        log(f"  (cost analysis unavailable: {type(e).__name__}: {e})")
        return None, None


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
    from pixelrec_multimodal_tpu.training.optimizers import build_optimizer
    from pixelrec_multimodal_tpu.training.steps import (
        gather_feature_kwargs, init_train_state, make_step_fns)

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    tables = {
        'tag_idx': jnp.asarray(rng.integers(0, N_TAGS, N_ITEMS), jnp.int32),
        'numerical': jnp.asarray(
            rng.standard_normal((N_ITEMS, NUM_FEAT)), jnp.float32),
        'vision_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, VISION_DIM)), jnp.float32),
        'language_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, LANG_DIM)), jnp.float32),
    }
    batches = {
        'user_idx': jnp.asarray(
            rng.integers(0, N_USERS, (NB, BATCH)), jnp.int32),
        'item_idx': jnp.asarray(
            rng.integers(0, N_ITEMS, (NB, BATCH)), jnp.int32),
        'tag_idx': jnp.asarray(rng.integers(0, N_TAGS, (NB, BATCH)), jnp.int32),
        'label': jnp.asarray(
            rng.integers(0, 2, (NB, BATCH)), jnp.float32),
        'weight': jnp.ones((NB, BATCH), jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    samples = NB * BATCH

    def build(dropout, bn):
        model = MultimodalRecommender(
            n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
            num_numerical_features=NUM_FEAT, embedding_dim=EMB,
            vision_feature_dim=VISION_DIM, language_feature_dim=LANG_DIM,
            use_contrastive=False, fusion_hidden_dims=list(HIDDEN),
            fusion_type='concatenate', use_batch_norm=bn,
            dropout_rate=dropout, dtype=jnp.bfloat16)
        tx = build_optimizer('adamw', 1e-3, 0.01, gradient_clip=1.0)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        _, _, train_epoch, eval_epoch = make_step_fns(
            model, tables, use_contrastive=False, return_epoch_fns=True)
        return model, tx, state, train_epoch, eval_epoch

    results = {}

    def report(name, seconds, flops, bytes_):
        sps = samples / seconds
        row = {'seconds_per_epoch': round(seconds, 4),
               'samples_per_sec': round(sps, 0)}
        line = f"{name:<12} {seconds*1e3:8.1f} ms  {sps:12,.0f} samples/s"
        if flops:
            gf = flops / samples / 1e9
            tfl = sps * gf / 1e3
            row.update(mflops_per_sample=round(gf * 1e3, 2),
                       tflops=round(tfl, 2),
                       pct_compute_peak=round(100 * tfl / V5E_PEAK_TFLOPS, 1))
            line += (f"  {gf*1e3:7.1f} MF/sample {tfl:6.1f} TFLOPS "
                     f"({row['pct_compute_peak']:.0f}%)")
        if bytes_:
            bps = bytes_ / samples
            gbs = sps * bps / 1e9
            row.update(kb_per_sample=round(bps / 1e3, 2),
                       gb_per_sec=round(gbs, 1),
                       pct_hbm_peak=round(100 * gbs * 1e9 / V5E_HBM, 1))
            line += (f"  {bps/1e3:6.1f} KB/sample {gbs:6.0f} GB/s "
                     f"({row['pct_hbm_peak']:.0f}% HBM)")
        results[name] = row
        log(line)

    def time_train_epoch(train_epoch, state0):
        """Compile + first (state donated), then REPS pipelined reps
        threading the carry, one value fetch at the end (block_until_ready
        lies through the axon tunnel)."""
        st, m = train_epoch(state0, batches, key)
        _ = float(np.asarray(m['total_loss'])[0])
        t0 = time.time()
        for r in range(REPS):
            st, m = train_epoch(st, batches, jax.random.fold_in(key, r))
        _ = float(np.asarray(m['total_loss'])[0])
        return (time.time() - t0) / REPS

    # ---------------- full production epoch (+ XLA cost analysis via the
    # raw jitted fn, tables as explicit args — closure capture would bake
    # the 512MB vision table into the lowered HLO)
    model, tx, state, train_epoch, eval_epoch = build(0.1, True)
    fl, by = _ca(train_epoch.jitted, state, tables, batches, key)
    t = time_train_epoch(train_epoch, state)
    report('full', t, fl, by)

    # ---------------- no dropout
    _, _, st2, te2, _ = build(0.0, True)
    report('no_dropout', time_train_epoch(te2, st2), None, None)

    # ---------------- no BatchNorm
    _, _, st3, te3, _ = build(0.1, False)
    report('no_bn', time_train_epoch(te3, st3), None, None)

    # ---------------- forward only (eval epoch; fresh un-donated state)
    _, _, st4, _, ee4 = build(0.1, True)
    m = ee4(st4, batches)
    _ = float(np.asarray(m['total_loss'])[0])
    t0 = time.time()
    for _r in range(REPS):
        m = ee4(st4, batches)
    _ = float(np.asarray(m['total_loss'])[0])
    fl, by = _ca(ee4.jitted, st4, tables, batches)
    report('fwd_only', (time.time() - t0) / REPS, fl, by)

    # ---------------- gathers only
    @jax.jit
    def gather_epoch(tabs, bat):
        def body(carry, b):
            kw = gather_feature_kwargs(model, tabs, b)
            s = sum(jnp.sum(v.astype(jnp.float32) * b['weight'][:, None])
                    for v in kw.values())
            return carry + s, ()
        tot, _ = jax.lax.scan(body, jnp.float32(0), bat)
        return tot

    tot = gather_epoch(tables, batches)
    _ = float(tot)
    t0 = time.time()
    for _r in range(REPS):
        tot = gather_epoch(tables, batches)
    _ = float(tot)
    fl, by = _ca(gather_epoch, tables, batches)
    report('gather_only', (time.time() - t0) / REPS, fl, by)

    # ---------------- optimizer sweep only (fixed grads, NB chained steps)
    _, tx5, st5, _, _ = build(0.1, True)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-4), st5.params)

    @jax.jit
    def opt_epoch(params, opt_state, g):
        def body(carry, _):
            p, s = carry
            upd, s2 = tx5.update(g, s, p)
            return (optax.apply_updates(p, upd), s2), ()
        (p2, s2), _ = jax.lax.scan(
            body, (params, opt_state), None, length=NB)
        # scalar checksum: fetching a full param leaf through the tunnel
        # costs ~100ms/rep of pure transfer and corrupts the timing
        return jnp.sum(jax.tree_util.tree_leaves(p2)[0])

    fl, by = _ca(opt_epoch, st5.params, st5.opt_state, grads)
    _ = float(opt_epoch(st5.params, st5.opt_state, grads))
    t0 = time.time()
    for _r in range(REPS):
        out = opt_epoch(st5.params, st5.opt_state, grads)
    _ = float(out)
    report('opt_only', (time.time() - t0) / REPS, fl, by)

    # ---------------- lever variants (measured 2026-08-18; the last one is
    # the SHIPPED production configuration, trainer.py train()):
    #   packed table (one wide gather)  126.2 -> 123.2 ms
    #   packed bf16                     125.3 ms (neutral wall; halves
    #                                   table HBM residency)
    #   rbg dropout keys: measured DEAD END — bimodal runtime (87-91 ms in
    #   two compiles within one process, 482/509/3918 ms and 1.7-1.9M
    #   samples/s bench runs in three other processes, identical HLO;
    #   threefry holds ~126 ms throughout, so not tunnel load). The 32%
    #   dropout term stands as structural until the backend's rbg lowering
    #   is dependable; see training/steps.py dropout_key.
    from pixelrec_multimodal_tpu.training.steps import (
        dropout_key, make_step_fns as _msf)
    key_prod = dropout_key(1)
    pk = (f'packed::vision_emb={VISION_DIM}+language_emb={LANG_DIM}'
          f'+numerical={NUM_FEAT}')
    packed = jnp.concatenate(
        [tables['vision_emb'], tables['language_emb'],
         tables['numerical'].astype(jnp.float32)], axis=1)
    for name, tab_variant, k in (
            ('full_packed',
             {'tag_idx': tables['tag_idx'], pk: packed}, key),
            ('full_production',
             {'tag_idx': tables['tag_idx'],
              pk: packed.astype(jnp.bfloat16)}, key_prod)):
        model9, _, st9, _, _ = build(0.1, True)
        _, _, te9, _ = _msf(model9, tab_variant, use_contrastive=False,
                            return_epoch_fns=True)
        st9, m = te9(st9, batches, k)
        _ = float(np.asarray(m['total_loss'])[0])
        t0 = time.time()
        for r in range(REPS):
            st9, m = te9(st9, batches, jax.random.fold_in(k, r))
        _ = float(np.asarray(m['total_loss'])[0])
        report(name, (time.time() - t0) / REPS, None, None)

    # ---------------- decomposition
    full_s = results['full']['seconds_per_epoch']
    decomp = {
        'dropout_pct': round(100 * (full_s - results['no_dropout'][
            'seconds_per_epoch']) / full_s, 1),
        'bn_pct': round(100 * (full_s - results['no_bn'][
            'seconds_per_epoch']) / full_s, 1),
        'bwd_opt_pct': round(100 * (full_s - results['fwd_only'][
            'seconds_per_epoch']) / full_s, 1),
        'gather_pct': round(100 * results['gather_only'][
            'seconds_per_epoch'] / full_s, 1),
        'opt_sweep_pct': round(100 * results['opt_only'][
            'seconds_per_epoch'] / full_s, 1),
    }
    log(f"decomposition vs full epoch: dropout {decomp['dropout_pct']}%, "
        f"BN {decomp['bn_pct']}%, bwd+opt {decomp['bwd_opt_pct']}%, "
        f"gathers {decomp['gather_pct']}%, opt sweep {decomp['opt_sweep_pct']}%")
    print(json.dumps({'components': results, 'decomposition': decomp,
                      'batch': BATCH, 'batches_per_epoch': NB}, indent=2))


if __name__ == '__main__':
    main()
