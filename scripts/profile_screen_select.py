#!/usr/bin/env python
"""Candidate-selection cost on TPU: what the cascade screen's top-C
actually pays (round-5 finding: at C=400-1024 the streaming
approx_max_k(recall=1.0) merges cost more than the screen kernel saves —
token0 screen scan measured 45M pairs/s vs its 67-70M kernel-only rate).

Measures, at the flagship block geometry (B=8192 users):

  * approx_max_k over one item chunk at k in {50, 256, 512, 1024} and
    recall_target in {1.0, 0.95, 0.9},
  * lax.top_k (full sort) at the same ks,
  * the streaming-merge shape (concat carry + select, what
    _fast_topk_body pays per chunk),
  * a final candidate re-rank sort at width C (what a stacked per-chunk
    collection pays once per block).

Usage: python scripts/profile_screen_select.py [B] [N]
One JSON line per measurement.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(label, fn, extra=None):
    fn()  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    log(f"{label}: {dt * 1e3:.1f} ms")
    rec = {'metric': f'select_{label}', 'value': round(dt * 1e3, 2),
           'unit': 'ms'}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}  B={B} N={N}")
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)

    for k in (50, 256, 512, 1024):
        for recall in (1.0, 0.95, 0.9):
            @jax.jit
            def f(s, k=k, recall=recall):
                v, i = jax.lax.approx_max_k(s, k, recall_target=recall)
                return v.sum() + i.sum()

            timed(f'approx_k{k}_r{int(recall * 100)}',
                  lambda f=f: float(f(scores)))

        @jax.jit
        def g(s, k=k):
            v, i = jax.lax.top_k(s, k)
            return v.sum() + i.sum()

        timed(f'sort_k{k}', lambda g=g: float(g(scores)))

        # streaming-merge shape: concat the running [B, k] carry with the
        # chunk and select (what merge_topk pays per chunk)
        carry = jnp.asarray(rng.standard_normal((B, k)), jnp.float32)

        @jax.jit
        def m(c, s, k=k):
            cat = jnp.concatenate([c, s], axis=-1)
            v, i = jax.lax.approx_max_k(cat, k, recall_target=1.0)
            return v.sum() + i.sum()

        timed(f'merge_k{k}', lambda m=m: float(m(carry, scores)))

    # final re-rank of a stacked candidate set (width 2C from 2 chunks)
    for C in (512, 1024, 2048):
        cand = jnp.asarray(rng.standard_normal((B, 2 * C)), jnp.float32)

        @jax.jit
        def r(c, C=C):
            v, i = jax.lax.top_k(c, C)
            return v.sum() + i.sum()

        timed(f'rerank_2x{C}', lambda r=r: float(r(cand)))


if __name__ == '__main__':
    main()
