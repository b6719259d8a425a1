#!/usr/bin/env python
"""Unfrozen e2e-training roofline decomposition (VERDICT r3 weak #4).

bench_training.py --e2e measures the full unfrozen step (ResNet-50 +
MiniLM-geometry towers in-graph, bf16 + remat) at ~1,880 samples/s ≈ 42%
MFU. This profiler decomposes where the rest goes: each component is
timed as its own jitted computation at the SAME batch/dtype/remat
configuration, with XLA's own FLOP estimate (compiled cost analysis)
where available and analytic counts as fallback.

Components:
  vision_fwd          ResNet-50 forward, bf16
  vision_step         forward+backward+"optimizer-shaped" update, no remat
  vision_step_remat   same under jax.checkpoint (the production config)
  text_fwd/_step      MiniLM-geometry (6L/384/seq-64) tower
  embed_head_step     everything EXCEPT the encoders (frozen-path step)
  full_step           the production e2e train step (reference point)

Reference anchor: the training loop this replaces is
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

BATCH = 256
STEPS = 6
TEXT_LEN = 64

# Analytic FLOPs per sample (multiply-accumulate = 2 FLOPs), used when
# XLA cost analysis is unavailable through the remote client.
RESNET50_FWD_GFLOPS = 8.2        # 4.1 GMACs at 224px
MINILM_FWD_GFLOPS = 2 * 6 * (4 * 384 * 384 + 2 * 384 * 1536) * TEXT_LEN / 1e9
V5E_PEAK_TFLOPS = 159.0          # measured square-matmul bf16 peak (BASELINE)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time(fn, *args):
    """Median seconds of STEPS calls, value-fetch synced (axon tunnel:
    block_until_ready does not wait)."""
    import jax.numpy as jnp
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    times = []
    for _i in range(STEPS):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        times.append(time.time() - t0)
    return float(np.median(times))


def _xla_gflops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca['flops']) / 1e9
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from pixelrec_multimodal_tpu.encoders.registry import (
        build_language_encoder, build_vision_encoder)

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((BATCH, 3, 224, 224)),
                         jnp.float32)
    ids = jnp.asarray(rng.integers(1, 30000, (BATCH, TEXT_LEN)), jnp.int32)
    mask = jnp.ones((BATCH, TEXT_LEN), jnp.int32)

    results = {}

    def report(name, seconds, gflops_per_sample):
        sps = BATCH / seconds
        tflops = sps * gflops_per_sample / 1e3
        results[name] = {
            'seconds_per_step': round(seconds, 4),
            'samples_per_sec': round(sps, 1),
            'gflops_per_sample': round(gflops_per_sample, 2),
            'tflops': round(tflops, 1),
            'pct_of_peak': round(100 * tflops / V5E_PEAK_TFLOPS, 1),
        }
        log(f"{name:<22} {seconds*1e3:8.1f} ms  {sps:9.0f} samples/s "
            f"{gflops_per_sample:7.2f} GF/sample {tflops:7.1f} TFLOPS "
            f"({100 * tflops / V5E_PEAK_TFLOPS:.0f}% peak)")

    # ---------------- vision tower
    vis = build_vision_encoder('resnet', dtype=jnp.bfloat16)
    vparams = vis.init(jax.random.PRNGKey(0), images[:2])['params']

    @jax.jit
    def vis_fwd(p, x):
        return vis.apply({'params': p}, x)[1]

    g = _xla_gflops(vis_fwd, vparams, images)
    fwd_gf = (g / BATCH) if g else RESNET50_FWD_GFLOPS
    report('vision_fwd', _time(vis_fwd, vparams, images), fwd_gf)

    def make_step(apply_fn, params, *inputs):
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        @jax.jit
        def step(p, s, *inp):
            def loss(q):
                out = apply_fn(q, *inp)
                return jnp.mean(jnp.square(out.astype(jnp.float32)))
            l, grads = jax.value_and_grad(loss)(p)
            updates, s2 = tx.update(grads, s, p)
            return l, optax.apply_updates(p, updates), s2
        return step, opt_state

    def vis_apply(p, x):
        return vis.apply({'params': p}, x)[1]

    step, ost = make_step(vis_apply, vparams, images)
    g = _xla_gflops(step, vparams, ost, images)
    step_gf = (g / BATCH) if g else 3 * RESNET50_FWD_GFLOPS
    report('vision_step', _time(step, vparams, ost, images), step_gf)

    vis_remat = jax.checkpoint(vis_apply)
    step_r, ost = make_step(vis_remat, vparams, images)
    g = _xla_gflops(step_r, vparams, ost, images)
    remat_gf = (g / BATCH) if g else 4 * RESNET50_FWD_GFLOPS
    report('vision_step_remat', _time(step_r, vparams, ost, images), remat_gf)

    # ---------------- text tower
    txt = build_language_encoder('sentence-bert', dtype=jnp.bfloat16)
    tparams = txt.init(jax.random.PRNGKey(1), ids[:2], mask[:2])['params']

    @jax.jit
    def txt_fwd(p, i, m):
        return txt.apply({'params': p}, i, m)[1]

    g = _xla_gflops(txt_fwd, tparams, ids, mask)
    tf_gf = (g / BATCH) if g else MINILM_FWD_GFLOPS
    report('text_fwd', _time(txt_fwd, tparams, ids, mask), tf_gf)

    def txt_apply(p, i, m):
        return txt.apply({'params': p}, i, m)[1]

    tstep, tost = make_step(jax.checkpoint(txt_apply), tparams, ids, mask)
    g = _xla_gflops(tstep, tparams, tost, ids, mask)
    ts_gf = (g / BATCH) if g else 4 * MINILM_FWD_GFLOPS
    report('text_step_remat', _time(tstep, tparams, tost, ids, mask), ts_gf)

    # ---------------- full production e2e step (the reference point)
    from pixelrec_multimodal_tpu.config import ModelConfig
    from pixelrec_multimodal_tpu.models.end_to_end import (
        build_end_to_end_model)
    from pixelrec_multimodal_tpu.training.e2e_steps import (
        init_e2e_train_state, make_e2e_step_fns)
    from pixelrec_multimodal_tpu.training.optimizers import build_optimizer

    mc = ModelConfig()
    mc.vision_model = 'resnet'
    mc.language_model = 'sentence-bert'
    mc.embedding_dim = 64
    mc.fusion_hidden_dims = [512, 256, 128]
    mc.use_contrastive = False
    mc.dropout_rate = 0.1
    model = build_end_to_end_model(mc, 4096, 65536, 64,
                                   num_numerical_features=0,
                                   encoder_dtype=jnp.bfloat16,
                                   remat_encoders=True)
    tx = build_optimizer('adamw', 1e-4, 0.01, gradient_clip=1.0)
    state = init_e2e_train_state(model, tx, jax.random.PRNGKey(0),
                                 text_len=TEXT_LEN)
    train_step, _ = make_e2e_step_fns(model, {})
    batch = {
        'user_idx': jnp.asarray(rng.integers(0, 4096, BATCH), jnp.int32),
        'item_idx': jnp.asarray(rng.integers(0, 65536, BATCH), jnp.int32),
        'tag_idx': jnp.asarray(rng.integers(0, 64, BATCH), jnp.int32),
        'label': jnp.asarray(rng.integers(0, 2, BATCH), jnp.float32),
        'weight': jnp.ones((BATCH,), jnp.float32),
        'image': images,
        'text_input_ids': ids,
        'text_attention_mask': mask,
    }
    key = jax.random.PRNGKey(1)

    def full(s):
        s2, metrics = train_step(s, dict(batch), key)
        return metrics['total_loss'], s2

    # time with state threading (weights update in place; jit caches)
    t0 = time.time()
    _l, state = full(state)
    _ = float(_l)
    log(f"full step compile+first: {time.time() - t0:.1f}s")
    times = []
    for _i in range(STEPS):
        t0 = time.time()
        l, state = full(state)
        _ = float(l)
        times.append(time.time() - t0)
    full_s = float(np.median(times))
    full_gf = remat_gf + ts_gf + 0.2   # encoders dominate; head ~0.2 GF
    report('full_step', full_s, full_gf)

    # ---------------- decomposition
    comp = results
    vis_ms = comp['vision_step_remat']['seconds_per_step']
    txt_ms = comp['text_step_remat']['seconds_per_step']
    other = full_s - vis_ms - txt_ms
    decomp = {
        'vision_pct': round(100 * vis_ms / full_s, 1),
        'text_pct': round(100 * txt_ms / full_s, 1),
        'other_pct': round(100 * other / full_s, 1),
        'remat_overhead_pct': round(
            100 * (vis_ms - comp['vision_step']['seconds_per_step'])
            / full_s, 1),
    }
    log(f"decomposition: vision {decomp['vision_pct']}% + text "
        f"{decomp['text_pct']}% + other {decomp['other_pct']}% "
        f"(remat recompute {decomp['remat_overhead_pct']}% of full)")
    print(json.dumps({'components': results, 'decomposition': decomp,
                      'batch': BATCH}, indent=2))


if __name__ == '__main__':
    main()
