#!/usr/bin/env python
"""Training-throughput benchmark: samples/sec through a full optimizer step.

Complements bench.py (inference/full-catalog top-K, the headline): this
measures the training side — the reference's per-batch python loop
(/root/reference/src/training/trainer.py:326-439: host collate, H2D copy,
forward, backward, clip, step, per-batch .item() sync) vs this framework's
compiled whole-epoch scan (pixelrec_multimodal_tpu/training/steps.py
train_epoch: one device call per epoch, one metrics transfer).

Same flagship geometry as bench.py (vision 2048 + language 384 towers,
7 numerical features, embedding 64, MLP [512,256,128] + BN). The torch
baseline runs the reference's default batch size 64 (reference
config.py:76); ours runs the batch size a TPU-native design would pick.

Prints ONE json line {"metric", "value", "unit", "vs_baseline"}.
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
OUR_BATCH = 32768
NUM_BATCHES = 32           # one epoch = 1M samples in ONE device call
TORCH_BATCH = 64           # reference default (config.py:76)
TORCH_BATCHES = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _synthetic_batches(num_batches, batch, seed=0):
    rng = np.random.default_rng(seed)
    return {
        'user_idx': rng.integers(0, N_USERS, (num_batches, batch)).astype(np.int32),
        'item_idx': rng.integers(0, N_ITEMS, (num_batches, batch)).astype(np.int32),
        'tag_idx': rng.integers(0, N_TAGS, (num_batches, batch)).astype(np.int32),
        'label': rng.integers(0, 2, (num_batches, batch)).astype(np.float32),
        'weight': np.ones((num_batches, batch), np.float32),
    }


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
    from pixelrec_multimodal_tpu.training.optimizers import build_optimizer
    from pixelrec_multimodal_tpu.training.steps import (
        dropout_key, init_train_state, make_step_fns)

    log(f"devices: {jax.devices()}")
    model = MultimodalRecommender(
        n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUM_FEAT, embedding_dim=EMB,
        vision_feature_dim=VISION_DIM, language_feature_dim=LANG_DIM,
        use_contrastive=False, fusion_hidden_dims=HIDDEN,
        fusion_type='concatenate', use_batch_norm=True, dropout_rate=0.1,
        dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # Production table layout (trainer.py train()): float tables packed into
    # one wide-row gather table, uploaded at the model's bf16 compute dtype
    # (wall-neutral, halves table HBM residency; rbg dropout keys measured
    # bimodal/unshippable — scripts/profile_frozen_roofline.py).
    packed = np.concatenate([
        rng.standard_normal((N_ITEMS, VISION_DIM), np.float32),
        rng.standard_normal((N_ITEMS, LANG_DIM), np.float32),
        rng.standard_normal((N_ITEMS, NUM_FEAT), np.float32)], axis=1)
    tables = {
        'tag_idx': jnp.asarray(rng.integers(0, N_TAGS, N_ITEMS), jnp.int32),
        f'packed::vision_emb={VISION_DIM}+language_emb={LANG_DIM}'
        f'+numerical={NUM_FEAT}': jnp.asarray(packed, jnp.bfloat16),
    }
    tx = build_optimizer('adamw', 1e-3, 0.01, gradient_clip=1.0)
    state = init_train_state(model, tx, jax.random.PRNGKey(0))
    _, _, train_epoch, _ = make_step_fns(model, tables, use_contrastive=False,
                                         return_epoch_fns=True)

    batches = {k: jnp.asarray(v)
               for k, v in _synthetic_batches(NUM_BATCHES, OUR_BATCH).items()}
    key = dropout_key(1)

    log("compiling whole-epoch train scan...")
    t0 = time.time()
    state, metrics = train_epoch(state, batches, key)
    # Through the axon tunnel block_until_ready lies; fetch a value to time.
    first_loss = float(np.asarray(metrics['total_loss'])[0])
    log(f"compile+first epoch: {time.time() - t0:.1f}s (loss {first_loss:.4f})")

    reps = 3
    t0 = time.time()
    for r in range(reps):
        state, metrics = train_epoch(state, batches,
                                     jax.random.fold_in(key, r))
    last = float(np.asarray(metrics['total_loss'])[-1])
    elapsed = time.time() - t0
    samples = NUM_BATCHES * OUR_BATCH * reps
    sps = samples / elapsed
    log(f"tpu train: {samples} samples in {elapsed:.2f}s -> {sps:,.0f} "
        f"samples/s (final batch loss {last:.4f})")
    assert np.isfinite(last)
    return sps


def bench_torch_reference_style() -> float:
    """The reference trainer's per-batch pattern at its default batch size:
    per-item feature collate from a dict cache, forward, BCE, backward,
    clip_grad_norm_, optimizer.step, per-batch metric .item() syncs."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class RefModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.user_emb = nn.Embedding(N_USERS, EMB)
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
            x = torch.cat([self.user_emb(u), self.item_emb(i),
                           self.tag_emb(t), self.vproj(v), self.lproj(l),
                           self.nproj(n)], dim=1)
            return self.mlp(x)

    model = RefModel().train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01)
    crit = nn.BCELoss()
    rng = np.random.default_rng(0)
    feats = {
        'tag': torch.from_numpy(rng.integers(0, N_TAGS, N_ITEMS)),
        'vis': torch.from_numpy(
            rng.standard_normal((N_ITEMS, VISION_DIM)).astype(np.float32)),
        'lang': torch.from_numpy(
            rng.standard_normal((N_ITEMS, LANG_DIM)).astype(np.float32)),
        'num': torch.from_numpy(
            rng.standard_normal((N_ITEMS, NUM_FEAT)).astype(np.float32)),
    }
    b = _synthetic_batches(TORCH_BATCHES, TORCH_BATCH, seed=1)

    t0 = time.time()
    for s in range(TORCH_BATCHES):
        items = torch.from_numpy(b['item_idx'][s].astype(np.int64))
        users = torch.from_numpy(b['user_idx'][s].astype(np.int64))
        labels = torch.from_numpy(b['label'][s])
        # Per-item stack (the reference collates per-sample feature dicts in
        # DataLoader workers; done inline here, charitably).
        v = torch.stack([feats['vis'][j] for j in items])
        l = torch.stack([feats['lang'][j] for j in items])
        n = torch.stack([feats['num'][j] for j in items])
        t = feats['tag'][items]
        out = model(users, items, t, v, l, n).squeeze(-1)
        loss = crit(out.clamp(1e-7, 1 - 1e-7), labels)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        _ = loss.item()  # per-batch sync, as the reference's metrics do
    elapsed = time.time() - t0
    sps = TORCH_BATCHES * TORCH_BATCH / elapsed
    log(f"torch reference-style train: {TORCH_BATCHES * TORCH_BATCH} samples "
        f"in {elapsed:.1f}s -> {sps:,.0f} samples/s")
    return sps


E2E_BATCH = 256        # --batch N overrides
E2E_STEPS = 8
E2E_TEXT_LEN = 64


def bench_e2e(freeze: bool = False) -> float:
    """Unfrozen-encoder (raw-input) training: ResNet-50 + MiniLM-geometry
    towers IN the train graph, bf16 encoders with rematerialization, raw
    224x224 pixels + token ids in the batch (BASELINE.json configs #3/#4's
    encoder-in-graph path; device-compute throughput — batches live on
    device, host decode is measured separately by the loader tests)."""
    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.config import ModelConfig
    from pixelrec_multimodal_tpu.models.end_to_end import (
        build_end_to_end_model, trainable_mask)
    from pixelrec_multimodal_tpu.training.e2e_steps import (
        init_e2e_train_state, make_e2e_step_fns)
    from pixelrec_multimodal_tpu.training.optimizers import (
        build_optimizer, with_frozen)

    log(f"devices: {jax.devices()}")
    mc = ModelConfig()
    mc.vision_model = 'resnet'
    mc.language_model = 'sentence-bert'
    mc.embedding_dim = EMB
    mc.fusion_hidden_dims = list(HIDDEN)
    mc.use_contrastive = False
    mc.dropout_rate = 0.1
    model = build_end_to_end_model(mc, N_USERS, N_ITEMS, N_TAGS,
                                   num_numerical_features=0,
                                   encoder_dtype=jnp.bfloat16,
                                   remat_encoders=True)
    tx = build_optimizer('adamw', 1e-4, 0.01, gradient_clip=1.0)
    state = init_e2e_train_state(model, tx, jax.random.PRNGKey(0),
                                 text_len=E2E_TEXT_LEN)
    if freeze:
        tx = with_frozen(tx, trainable_mask(state.params))
        state = state.replace(tx=tx, opt_state=tx.init(state.params))
    train_step, _ = make_e2e_step_fns(model, {})

    rng = np.random.default_rng(0)
    batch = {
        'user_idx': jnp.asarray(
            rng.integers(0, N_USERS, E2E_BATCH), jnp.int32),
        'item_idx': jnp.asarray(
            rng.integers(0, N_ITEMS, E2E_BATCH), jnp.int32),
        'tag_idx': jnp.asarray(rng.integers(0, N_TAGS, E2E_BATCH), jnp.int32),
        'label': jnp.asarray(rng.integers(0, 2, E2E_BATCH), jnp.float32),
        'weight': jnp.ones((E2E_BATCH,), jnp.float32),
        'image': jnp.asarray(
            rng.standard_normal((E2E_BATCH, 3, 224, 224)), jnp.float32),
        'text_input_ids': jnp.asarray(
            rng.integers(1, 30000, (E2E_BATCH, E2E_TEXT_LEN)), jnp.int32),
        'text_attention_mask': jnp.ones((E2E_BATCH, E2E_TEXT_LEN), jnp.int32),
    }
    key = jax.random.PRNGKey(1)

    log(f"compiling e2e train step (freeze={freeze})...")
    t0 = time.time()
    state, metrics = train_step(state, dict(batch), key)
    first = float(metrics['total_loss'])
    log(f"compile+first step: {time.time() - t0:.1f}s (loss {first:.4f})")

    t0 = time.time()
    for s in range(E2E_STEPS):
        state, metrics = train_step(state, dict(batch),
                                    jax.random.fold_in(key, s))
    last = float(metrics['total_loss'])
    elapsed = time.time() - t0
    sps = E2E_STEPS * E2E_BATCH / elapsed
    log(f"tpu e2e train: {E2E_STEPS * E2E_BATCH} samples in {elapsed:.2f}s "
        f"-> {sps:,.0f} samples/s (loss {first:.4f} -> {last:.4f})")
    assert np.isfinite(last)
    return sps


def main():
    global E2E_BATCH
    if '--batch' in sys.argv:
        E2E_BATCH = int(sys.argv[sys.argv.index('--batch') + 1])
    if '--e2e' in sys.argv:
        ours = bench_e2e(freeze='--freeze' in sys.argv)
        print(json.dumps({
            'metric': 'e2e_unfrozen_train_samples_per_sec',
            'value': round(ours, 1),
            'unit': 'samples/sec/chip'}), flush=True)
        return
    baseline = bench_torch_reference_style()
    try:
        ours = bench_ours()
    except Exception as e:
        log(f"bench attempt 1 failed ({e!r}); retrying in 30s...")
        time.sleep(30)
        ours = bench_ours()
    print(json.dumps({
        'metric': 'train_step_samples_per_sec',
        'value': round(ours, 1),
        'unit': 'samples/sec/chip',
        'vs_baseline': round(ours / baseline, 2) if baseline > 0 else None,
    }), flush=True)


if __name__ == '__main__':
    main()
