#!/usr/bin/env python
"""Gather-bandwidth microbench for candidate-row staging on TPU.

The funnel cascade's stage 2 (and the exact rescore, and
score_candidates) gather per-(user, candidate) table rows. The round-5
funnel breakdown measured the gathered token0 candidate screen at an
effective ~30-60 GB/s of gather traffic — far under HBM. This bench
isolates what jnp.take actually achieves at the production shapes and
which layout recovers the gap:

  * per-table gathers (3 tables, dp-padded f32) — the shipped layout,
  * ONE wide concatenated row gather (f32 / bf16, dp-padded / d-packed),
  * with and without the user-sub-block scan structure the production
    path uses.

Usage: python scripts/profile_candidate_gather.py [B] [C]
One JSON line per measurement (achieved GB/s of useful row bytes).
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITEMS = 65536


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}  B={B} C={C}")
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_ITEMS, (B, C)).astype(np.int32))

    def timed(label, fn, nbytes):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        gbps = nbytes / dt / 1e9
        log(f"{label}: {dt:.3f}s -> {gbps:.1f} GB/s")
        print(json.dumps({'metric': f'cand_gather_{label}',
                          'value': round(gbps, 2), 'unit': 'GB/s',
                          'wall_s': round(dt, 3)}), flush=True)

    # shipped layout: 3 dp-padded f32 tables (it_k 512, it_vo 2048,
    # tail 128 lanes)
    widths = (512, 2048, 128)
    tabs_f32 = tuple(jnp.asarray(
        rng.standard_normal((N_ITEMS, w)).astype(np.float32))
        for w in widths)
    total_w = sum(widths)

    # production scan structure: SB=256 user sub-blocks x CC=256
    # candidate chunks
    def scan_gather(tabs, ci, SB=256, CC=256):
        nb, ncc = B // SB, C // CC
        ci = ci.reshape(nb, SB, C)

        def body(_, ci_b):
            ci_cc = ci_b.reshape(SB, ncc, CC).transpose(1, 0, 2)

            def cbody(_, ci_c):
                rows = tuple(jnp.take(t, ci_c, axis=0) for t in tabs)
                return None, sum(r.astype(jnp.float32).sum() for r in rows)

            _, s = jax.lax.scan(cbody, None, ci_cc)
            return None, s.sum()

        _, out = jax.lax.scan(body, None, ci)
        return out.sum()

    f = jax.jit(partial(scan_gather, tabs_f32))
    timed('3tables_f32_scan', lambda: float(f(idx)),
          B * C * total_w * 4)

    # one wide concatenated table, same scan structure
    wide_f32 = jnp.concatenate(tabs_f32, axis=1)
    f = jax.jit(partial(scan_gather, (wide_f32,)))
    timed('wide_f32_scan', lambda: float(f(idx)), B * C * total_w * 4)

    wide_bf16 = wide_f32.astype(jnp.bfloat16)
    f = jax.jit(partial(scan_gather, (wide_bf16,)))
    timed('wide_bf16_scan', lambda: float(f(idx)), B * C * total_w * 2)

    # d-packed (64 of 128 lanes live) bf16 wide table: the useful bytes
    pack_w = total_w // 2
    packed_bf16 = wide_bf16[:, :pack_w]
    f = jax.jit(partial(scan_gather, (packed_bf16,)))
    timed('packed_bf16_scan', lambda: float(f(idx)),
          B * C * pack_w * 2)

    # no scan: one flat gather (memory high-water B*C*w — only at the
    # packed width)
    @jax.jit
    def flat(ci):
        rows = jnp.take(packed_bf16, ci.reshape(-1), axis=0)
        return rows.astype(jnp.float32).sum()

    timed('packed_bf16_flat', lambda: float(flat(idx)),
          B * C * pack_w * 2)

    # one-hot matmul alternative at SB x CC block scale: gather as
    # [CC, N_block] x [N_block, w] MXU contraction is the classic
    # embedding trick — only sane on small vocab slices; measured here
    # as a reference point at CC=256 against a 8192-row table slice.
    sl = packed_bf16[:8192]

    @jax.jit
    def onehot(ci):
        ci_c = jnp.clip(ci[:256, :256], 0, 8191)
        oh = jax.nn.one_hot(ci_c, 8192, dtype=jnp.bfloat16)
        rows = jnp.einsum('bcn,nw->bcw', oh, sl)
        return rows.astype(jnp.float32).sum()

    timed('onehot_256x256_n8192', lambda: float(onehot(idx)),
          256 * 256 * pack_w * 2)


if __name__ == '__main__':
    main()
