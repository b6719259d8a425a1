#!/usr/bin/env python
"""Headline benchmark: scored user-item pairs/sec at full-catalog top-K.

This is BASELINE.json's metric — the reference's inference hot loop
(/root/reference/src/inference/recommender.py:96-106: python batches of 256,
per-item feature collate, host sort) vs this framework's streaming on-device
top-K scorer (pixelrec_multimodal_tpu/inference/scorer.py).

Setup: flagship multimodal scorer (ResNet-50-dim vision tower 2048 + SBERT-dim
language tower 384 + 7 numerical features, embedding 64, concat fusion, MLP
[512,256,128] + BatchNorm + sigmoid) over a synthetic catalog with precomputed
encoder embeddings (the frozen-encoder production path on both sides).

The torch reference-style baseline is measured once on this machine (CPU,
mirroring the reference's single-process scoring loop) and cached in
``.bench_baseline.json``.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

N_ITEMS = 65536
N_USERS = 8192
TOP_K = 50
EMB = 64
VISION_DIM = 2048
LANG_DIM = 384
NUM_FEAT = 7
HIDDEN = (512, 256, 128)
N_TAGS = 64
BASELINE_CACHE = Path(__file__).parent / '.bench_baseline.json'
BASELINE_USERS = 2  # users to measure for the torch reference-style loop


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------- ours
def bench_tpu() -> float:
    if os.environ.get('BENCH_SELFTEST_HANG'):
        # Dead-tunnel simulation hook (tests/unit/test_bench_policy.py):
        # mimics jax.devices() hanging inside a wedged axon client.
        time.sleep(10_000)
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

    # Auto geometry: item_chunk 32768 / user_chunk 8192 on TPU (measured
    # sweep: 293M pairs/s at 8192/1024 -> 423M at 32768/8192).
    scorer = CatalogScorer(model, variables, store)
    users = rng.integers(0, 4096, N_USERS).astype(np.int32)

    log("warmup/compile...")
    t0 = time.time()
    scorer.top_k(users[:scorer.user_chunk], TOP_K)
    log(f"compile+first batch: {time.time() - t0:.1f}s")

    # Median of 3 independently timed runs (tunnel throughput jitters +-8%,
    # CLAUDE.md; BASELINE.md round-1 reconciliation).
    rates = []
    for r in range(3):
        t0 = time.time()
        v, i = scorer.top_k(users, TOP_K)
        dt = time.time() - t0
        rates.append(N_USERS * N_ITEMS / dt)
        log(f"run {r + 1}: {dt:.2f}s -> {rates[-1]:,.0f} pairs/s")
    pps = float(np.median(rates))
    log(f"tpu median of 3: {pps:,.0f} pairs/s")
    log_roofline(pps)
    return pps


def log_roofline(pps: float):
    """Roofline accounting for the fused pairwise-MLP kernel (stderr only).

    Per-pair FLOPs (factorized head, BN folded): the broadcast add+act over
    h1, two hidden matmuls, and the final VPU reduce. Per-pair HBM bytes:
    item_first tiles re-read once per user row-block (h1*4/TILE_USERS), user
    tiles once per chunk, the f32 score-matrix write + the mask/top-k
    re-read. The naive (unfused) roofline charges every MLP activation a
    round trip — that is the wall the Pallas kernel removes.
    """
    h1, h2, h3 = 512, HIDDEN[1], HIDDEN[2]
    TB = 64  # kernel user tile (scorer.py)
    flops = 2 * h1 * h2 + 2 * h2 * h3 + 2 * h3 + 3 * h1  # per pair
    fused_bytes = h1 * 4 / TB + 4 + 8        # item tiles + write + reread
    naive_bytes = (h1 + h2 + h3) * 4 * 2     # unfused activation round trips
    HBM = 819e9           # v5e HBM bandwidth, bytes/s
    PEAK = 159e12         # measured square-matmul bf16 peak on this chip
    fused_hbm_bound = HBM / fused_bytes
    naive_hbm_bound = HBM / naive_bytes
    compute_bound = PEAK / flops
    bound = min(fused_hbm_bound, compute_bound)
    log(f"roofline: {flops} FLOPs/pair, fused {fused_bytes:.1f} B/pair "
        f"(naive {naive_bytes} B/pair)")
    log(f"  fused HBM bound   {fused_hbm_bound / 1e9:.1f}G pairs/s")
    log(f"  naive HBM bound   {naive_hbm_bound / 1e6:.0f}M pairs/s "
        f"(achieved {pps / naive_hbm_bound:.2f}x of it)")
    log(f"  compute bound     {compute_bound / 1e6:.0f}M pairs/s (binding)")
    log(f"  achieved          {pps / 1e6:.0f}M pairs/s = "
        f"{100 * pps / bound:.0f}% of binding roofline "
        f"({pps * flops / 1e12:.0f} TFLOPS)")


# ----------------------------------------------------------- torch baseline
def bench_torch_reference_style() -> float:
    """The reference's scoring pattern: per-user loop over batches of 256
    with per-item feature assembly from a python dict cache, forward, host
    sort (recommender.py:96-236)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class RefModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.user_emb = nn.Embedding(4096, EMB)
            self.item_emb = nn.Embedding(N_ITEMS, EMB)
            self.tag_emb = nn.Embedding(N_TAGS, EMB)
            self.vproj = nn.Sequential(nn.Linear(VISION_DIM, EMB), nn.ReLU())
            self.lproj = nn.Sequential(nn.Linear(LANG_DIM, EMB), nn.ReLU())
            self.nproj = nn.Sequential(nn.Linear(NUM_FEAT, EMB), nn.ReLU())
            dims, layers = 6 * EMB, []
            for h in HIDDEN:
                layers += [nn.Linear(dims, h), nn.ReLU(), nn.BatchNorm1d(h)]
                dims = h
            layers += [nn.Linear(dims, 1), nn.Sigmoid()]
            self.mlp = nn.Sequential(*layers)

        def forward(self, u, i, t, v, l, n):
            x = torch.cat([self.user_emb(u), self.item_emb(i), self.tag_emb(t),
                           self.vproj(v), self.lproj(l), self.nproj(n)], dim=1)
            return self.mlp(x)

    model = RefModel().eval()
    rng = np.random.default_rng(0)
    # Feature cache of per-item tensors, as the reference holds them.
    feats = {
        'tag': torch.from_numpy(rng.integers(0, N_TAGS, N_ITEMS)),
        'vis': torch.from_numpy(
            rng.standard_normal((N_ITEMS, VISION_DIM)).astype(np.float32)),
        'lang': torch.from_numpy(
            rng.standard_normal((N_ITEMS, LANG_DIM)).astype(np.float32)),
        'num': torch.from_numpy(
            rng.standard_normal((N_ITEMS, NUM_FEAT)).astype(np.float32)),
    }

    batch = 256  # reference recommender.py:97
    t0 = time.time()
    with torch.no_grad():
        for u in range(BASELINE_USERS):
            scores = []
            for s in range(0, N_ITEMS, batch):
                idx = torch.arange(s, min(s + batch, N_ITEMS))
                # Per-item stack (the reference collates feature dicts).
                v = torch.stack([feats['vis'][j] for j in idx])
                l = torch.stack([feats['lang'][j] for j in idx])
                n = torch.stack([feats['num'][j] for j in idx])
                t = feats['tag'][idx]
                uu = torch.full((len(idx),), u, dtype=torch.long)
                out = model(uu, idx, t, v, l, n)
                scores.extend(zip(idx.tolist(), out.squeeze(-1).tolist()))
            scores.sort(key=lambda x: x[1], reverse=True)
            scores = scores[:TOP_K]
    elapsed = time.time() - t0
    pps = BASELINE_USERS * N_ITEMS / elapsed
    log(f"torch reference-style: {BASELINE_USERS} users x {N_ITEMS} items in "
        f"{elapsed:.1f}s -> {pps:,.0f} pairs/s")
    return pps


def get_baseline() -> float:
    if BASELINE_CACHE.exists():
        try:
            with open(BASELINE_CACHE) as f:
                cached = json.load(f)
            if cached.get('config') == [N_ITEMS, EMB, list(HIDDEN)]:
                return cached['pairs_per_sec']
        except Exception:
            pass
    pps = bench_torch_reference_style()
    try:
        with open(BASELINE_CACHE, 'w') as f:
            json.dump({'pairs_per_sec': pps,
                       'config': [N_ITEMS, EMB, list(HIDDEN)]}, f)
    except Exception:
        pass
    return pps


# -------------------------------------------------------- bounded execution
# A wedged axon tunnel hangs inside jax.devices() — no exception ever
# surfaces, so in-process retries cannot bound it (round-3 postmortem:
# the driver run timed out at rc=124 with nothing on stdout). The TPU
# measurement therefore runs in a watched SUBPROCESS: if the child does
# not get past device discovery within DEVICES_TIMEOUT the tunnel is
# dead and the attempt is killed fast; once devices appear, the child
# gets a generous total budget (remote compiles run 3-190s). Dead
# tunnel => at most 2 short attempts, exit rc=1 with the reason on
# stderr and NOTHING on stdout.
DEVICES_TIMEOUT = int(os.environ.get('BENCH_DEVICES_TIMEOUT', 120))
TOTAL_TIMEOUT = int(os.environ.get('BENCH_TOTAL_TIMEOUT', 900))
MAX_ATTEMPTS = 3         # flaky-but-alive tunnel retries
DEAD_ATTEMPTS = 2        # attempts that never reached device discovery


class AttemptFailed(RuntimeError):
    def __init__(self, reason, dead_tunnel=False):
        super().__init__(reason)
        self.dead_tunnel = dead_tunnel


def _run_attempt() -> float:
    import subprocess
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        errpath = os.path.join(td, 'err.log')
        outpath = os.path.join(td, 'out.json')
        with open(errpath, 'w') as errf:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 '--tpu-child', outpath],
                stdout=errf, stderr=subprocess.STDOUT,
                cwd=os.path.dirname(os.path.abspath(__file__)) or '.')
            t0, devices_seen = time.time(), False
            try:
                while proc.poll() is None:
                    time.sleep(2)
                    elapsed = time.time() - t0
                    if not devices_seen:
                        with open(errpath) as f:
                            devices_seen = 'devices:' in f.read()
                    if not devices_seen and elapsed > DEVICES_TIMEOUT:
                        raise AttemptFailed(
                            f"no device discovery within {DEVICES_TIMEOUT}s "
                            "(axon tunnel dead)", dead_tunnel=True)
                    if elapsed > TOTAL_TIMEOUT:
                        raise AttemptFailed(
                            f"attempt exceeded {TOTAL_TIMEOUT}s total")
            except AttemptFailed:
                proc.kill()
                proc.wait()
                raise
            finally:
                with open(errpath) as f:
                    sys.stderr.write(f.read())
                sys.stderr.flush()
        if proc.returncode != 0:
            raise AttemptFailed(f"child exited rc={proc.returncode}")
        with open(outpath) as f:
            return json.load(f)['pairs_per_sec']


def main():
    baseline = get_baseline()
    ours, dead_hits = None, 0
    for attempt in range(1, MAX_ATTEMPTS + 1):
        try:
            ours = _run_attempt()
            break
        except AttemptFailed as e:
            dead_hits += e.dead_tunnel
            log(f"bench attempt {attempt} failed: {e}")
            if dead_hits >= DEAD_ATTEMPTS:
                log("tunnel looks dead; giving up (bounded-failure policy)")
                break
            if attempt < MAX_ATTEMPTS:
                log("retrying in 20s...")
                time.sleep(20)
    if ours is None:
        log("bench FAILED: no measurement obtained")
        sys.exit(1)
    print(json.dumps({
        'metric': 'full_catalog_topk_scored_pairs_per_sec',
        'value': round(ours, 1),
        'unit': 'pairs/sec/chip',
        'vs_baseline': round(ours / baseline, 2) if baseline > 0 else None,
    }), flush=True)


if __name__ == '__main__':
    if len(sys.argv) >= 3 and sys.argv[1] == '--tpu-child':
        pps = bench_tpu()
        with open(sys.argv[2], 'w') as f:
            json.dump({'pairs_per_sec': pps}, f)
        sys.exit(0)
    main()
