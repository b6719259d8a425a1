#!/usr/bin/env python
"""Kernel-only microbenchmarks for the fused pair-scoring Pallas kernels.

Times pallas_pairwise_scores (concat), pallas_pairwise_scores_gated and
pallas_attention_scores on synthetic tables OUTSIDE the scorer (no user
tower, no top-k, no chunk scan) to separate kernel throughput from
pipeline overhead. Sums each score matrix to a scalar so only O(1) bytes
cross the tunnel per timed call (fetch-based timing per CLAUDE.md).

Usage: python scripts/profile_fusion_kernels.py [concat|gated|attention|all]
           [tile_users] [tile_items]
Prints one JSON line per kernel on stdout.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 1024
C = 65536
H1 = 512
D = 64
DP = 128
MI = 4          # vision, language, tag, numerical
HEADS = 4
HIDDEN = (512, 256, 128)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_mlp_layers(rng):
    import jax.numpy as jnp
    layers = []
    prev = H1
    for width in (256, 128):
        layers.append((jnp.asarray(rng.standard_normal((prev, width)),
                                   jnp.float32) * 0.05,
                       jnp.zeros(width, jnp.float32)))
        prev = width
    # final layer padded to one lane group, column 0 live
    w = np.zeros((prev, 128), np.float32)
    w[:, 0] = rng.standard_normal(prev) * 0.05
    layers.append((jnp.asarray(w), jnp.zeros(128, jnp.float32)))
    return layers


def timed(label, fn, pairs):
    import jax.numpy as jnp
    float(fn())  # compile + warm
    rates = []
    for _ in range(3):
        t0 = time.time()
        float(fn())
        dt = time.time() - t0
        rates.append(pairs / dt)
    r = float(np.median(rates))
    log(f"{label}: {r / 1e6:.1f}M pairs/s "
        f"({[f'{x / 1e6:.0f}M' for x in rates]})")
    print(json.dumps({'metric': f'kernel_{label}', 'value': round(r, 1),
                      'unit': 'pairs/sec/chip'}), flush=True)
    return r


def main():
    import jax
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.ops.attention_scorer import (
        pallas_attention_scores,
    )
    from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
        GATE_PAD,
        pallas_pairwise_scores,
        pallas_pairwise_scores_gated,
    )

    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    tb = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    tc = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    layers = make_mlp_layers(rng)
    base = {'layers': layers, 'activation': 'relu',
            'final_activation': 'sigmoid',
            'b1': jnp.zeros(H1, jnp.float32), 'h1': H1}
    pairs = B * C

    if which in ('concat', 'concat_variants', 'all'):
        uf = jnp.asarray(rng.standard_normal((B, H1)), jnp.float32)
        itf = jnp.asarray(rng.standard_normal((C, H1)), jnp.float32)
        kw = {}
        if tb:
            kw = {'tile_users': tb, 'tile_items': tc or 128}

        @jax.jit
        def run_concat(uf, itf):
            return jnp.sum(pallas_pairwise_scores(base, uf, itf, **kw))

        timed('concat', lambda: run_concat(uf, itf), pairs)

    if which in ('concat_variants', 'all'):
        # (a) b1 folded into the item table: one fewer [TB,TC,h1] VPU add
        # per pair in the assembly (the kernel's VPU-binding term).
        fold = dict(base, b1_folded=True)

        @jax.jit
        def run_fold(uf, itf):
            return jnp.sum(pallas_pairwise_scores(fold, uf, itf, **kw))

        timed('concat_b1fold', lambda: run_fold(uf, itf), pairs)

        # (b) int8 hidden chain (2x MXU rate, + quantize VPU cost).
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            calibrate_head_ranges,
            quantize_mlp_chain,
        )
        ranges = calibrate_head_ranges(fold, uf[:64], itf[:512])
        q = dict(fold, qlayers=quantize_mlp_chain(fold, ranges))

        @jax.jit
        def run_q(uf, itf):
            return jnp.sum(pallas_pairwise_scores(q, uf, itf, **kw))

        timed('concat_int8', lambda: run_q(uf, itf), pairs)

    if which in ('gated', 'all'):
        head = dict(base, n_item_mods=MI)
        uf = jnp.asarray(rng.standard_normal((B, H1)), jnp.float32)
        ug = jnp.zeros((B, GATE_PAD), jnp.float32).at[:, :MI + 1].set(
            jnp.asarray(rng.standard_normal((B, MI + 1)), jnp.float32))
        itf = jnp.asarray(rng.standard_normal((C, MI * H1)), jnp.float32)
        ig = jnp.zeros((C, GATE_PAD), jnp.float32).at[:, :MI + 1].set(
            jnp.asarray(rng.standard_normal((C, MI + 1)), jnp.float32))
        kw = {}
        if tb:
            kw = {'tile_users': tb, 'tile_items': tc or 128}

        @jax.jit
        def run_gated(uf, ug, itf, ig):
            return jnp.sum(
                pallas_pairwise_scores_gated(head, uf, ug, itf, ig, **kw))

        timed('gated', lambda: run_gated(uf, ug, itf, ig), pairs)

    if which in ('gated_factored', 'all'):
        # Factored gated kernel (VERDICT r4 #5): per-side exp coefficients
        # + small-K MXU table contraction replace the per-pair VPU
        # assembly. A/B at bf16 (production) and f32 tables.
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            factor_gated_tables,
            factor_gated_user,
            pallas_pairwise_scores_gated_factored,
        )
        head = dict(base, n_item_mods=MI, b1_folded=True)
        uf = jnp.asarray(rng.standard_normal((B, H1)), jnp.float32)
        ug = jnp.zeros((B, GATE_PAD), jnp.float32).at[:, :MI + 1].set(
            jnp.asarray(rng.standard_normal((B, MI + 1)), jnp.float32))
        itf = jnp.asarray(rng.standard_normal((C, MI * H1)), jnp.float32)
        ig = jnp.zeros((C, GATE_PAD), jnp.float32).at[:, :MI + 1].set(
            jnp.asarray(rng.standard_normal((C, MI + 1)), jnp.float32))
        kw = {}
        if tb:
            kw = {'tile_users': tb, 'tile_items': tc or 128}
        ufx, a = jax.jit(partial(factor_gated_user, head))(uf, ug)
        for dt_name, dt in (('bf16', jnp.bfloat16), ('f32', jnp.float32)):
            t4, igb = jax.jit(partial(factor_gated_tables, head,
                                      table_dtype=dt))(itf, ig)

            @jax.jit
            def run_fact(ufx, a, t4, igb):
                return jnp.sum(pallas_pairwise_scores_gated_factored(
                    head, ufx, a, t4, igb, **kw))

            timed(f'gated_factored_{dt_name}',
                  lambda: run_fact(ufx, a, t4, igb), pairs)

            if dt_name == 'bf16':
                # int8 chain on TOP of the factored assembly: the
                # factorization moved the assembly to the MXU, so the
                # hidden chain is a larger share of kernel time than in
                # the exact kernel — the int8 flip point may sit lower.
                from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
                    calibrate_head_ranges_gated,
                    quantize_mlp_chain,
                )
                ranges = calibrate_head_ranges_gated(
                    head, (uf[:64], ug[:64]), (itf[:512], ig[:512]))
                qhead = dict(head, qlayers=quantize_mlp_chain(head, ranges))

                @jax.jit
                def run_fact_q(ufx, a, t4, igb):
                    return jnp.sum(pallas_pairwise_scores_gated_factored(
                        qhead, ufx, a, t4, igb, **kw))

                timed('gated_factored_int8',
                      lambda: run_fact_q(ufx, a, t4, igb), pairs)
            # agreement vs the exact gated kernel on a slice
            from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
                xla_pairwise_scores_gated,
            )
            sc_f = np.asarray(pallas_pairwise_scores_gated_factored(
                head, ufx[:64], a[:64], t4[:, :, :1024 * 128],
                igb[:, :1024], **kw))
            sc_x = np.asarray(jax.jit(partial(
                xla_pairwise_scores_gated, head))(
                    uf[:64], ug[:64], itf[:1024], ig[:1024]))
            top_f = np.argsort(-sc_f, axis=1)[:, :20]
            top_x = np.argsort(-sc_x, axis=1)[:, :20]
            agree = np.mean([len(set(p.tolist()) & set(q.tolist())) / 20
                             for p, q in zip(top_f, top_x)])
            log(f"gated_factored_{dt_name}: max|d|="
                f"{np.max(np.abs(sc_f - sc_x)):.2e} top20 set agreement "
                f"{agree:.4f}")

    if which in ('gated_int8', 'all'):
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            calibrate_head_ranges_gated,
            quantize_mlp_chain,
        )
        head = dict(base, n_item_mods=MI, b1_folded=True)
        uf = jnp.asarray(rng.standard_normal((B, H1)), jnp.float32)
        ug = jnp.zeros((B, GATE_PAD), jnp.float32).at[:, :MI + 1].set(
            jnp.asarray(rng.standard_normal((B, MI + 1)), jnp.float32))
        itf = jnp.asarray(rng.standard_normal((C, MI * H1)), jnp.float32)
        ig = jnp.zeros((C, GATE_PAD), jnp.float32).at[:, :MI + 1].set(
            jnp.asarray(rng.standard_normal((C, MI + 1)), jnp.float32))
        ranges = calibrate_head_ranges_gated(
            head, (uf[:64], ug[:64]), (itf[:512], ig[:512]))
        qhead = dict(head, qlayers=quantize_mlp_chain(head, ranges))
        kw = {}
        if tb:
            kw = {'tile_users': tb, 'tile_items': tc or 128}

        @jax.jit
        def run_gated_q(uf, ug, itf, ig):
            return jnp.sum(
                pallas_pairwise_scores_gated(qhead, uf, ug, itf, ig, **kw))

        timed('gated_int8', lambda: run_gated_q(uf, ug, itf, ig), pairs)

    if which in ('attention', 'attention_gram', 'screen', 'screen_sweep',
                 'all'):
        from pixelrec_multimodal_tpu.ops.attention_scorer import (
            _gram_layout,
            _user_sc_layout,
        )

        head = dict(base, n_item_mods=MI, H=HEADS, dh=D // HEADS, d=D,
                    dp=DP,
                    w1=jnp.asarray(rng.standard_normal((DP, H1)),
                                   jnp.float32) * 0.05,
                    ln_scale=jnp.ones(D, jnp.float32),
                    ln_bias=jnp.zeros(D, jnp.float32))
        _, n_sc = _gram_layout(HEADS, MI)
        _, n_usc = _user_sc_layout(HEADS)
        user_side = (
            jnp.asarray(rng.standard_normal((B, DP)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, DP)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, DP)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, HEADS * DP)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, 8)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, n_usc)), jnp.float32),
        )
        item_side = (
            jnp.asarray(rng.standard_normal((C, MI * DP)), jnp.float32),
            jnp.asarray(rng.standard_normal((C, MI * DP)), jnp.float32),
            jnp.asarray(rng.standard_normal((C, MI * DP)), jnp.float32),
            jnp.asarray(rng.standard_normal((C, MI * HEADS * DP)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal((C, HEADS * MI * MI)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal((C, MI * HEADS * DP)),
                        jnp.float32),
            # [dsum, mx] pairs; dsum strictly positive
            jnp.asarray(np.abs(rng.standard_normal((C, HEADS * MI * 2)))
                        + 0.5, jnp.float32),
            jnp.asarray(rng.standard_normal((C, n_sc)), jnp.float32),
        )
        kw = {}
        if tb:
            kw = {'tile_users': tb, 'tile_items': tc or 128}

        if which in ('attention', 'all'):
            @jax.jit
            def run_attention(user_side, item_side):
                return jnp.sum(
                    pallas_attention_scores(head, user_side, item_side, **kw))

            timed('attention', lambda: run_attention(user_side, item_side),
                  pairs)

        if which in ('attention_gram', 'all'):
            @jax.jit
            def run_gram(user_side, item_side):
                return jnp.sum(pallas_attention_scores(
                    head, user_side, item_side, variant='gram', **kw))

            timed('attention_gram',
                  lambda: run_gram(user_side, item_side), pairs)

        if which in ('screen', 'screen_sweep', 'all'):
            # Cascade screen kernel (ops/attention_cascade): exact token-0
            # attention + precomputed item tail. Kernel-only rate — the
            # cascade's effective throughput ceiling.
            from pixelrec_multimodal_tpu.ops.attention_cascade import (
                pallas_attention_screen_scores,
            )
            it_tail = jnp.asarray(rng.standard_normal((C, DP)), jnp.float32)

            def run_screen_at(tbu, tci):
                @jax.jit
                def run(user_side, item_side, it_tail):
                    return jnp.sum(pallas_attention_screen_scores(
                        head, user_side, item_side, it_tail,
                        tile_users=tbu, tile_items=tci))
                return timed(f'attention_screen_{tbu}x{tci}',
                             lambda: run(user_side, item_side, it_tail),
                             pairs)

            if which == 'screen_sweep':
                for tbu, tci in ((32, 128), (8, 256), (16, 256), (32, 256),
                                 (64, 128), (64, 256), (128, 256)):
                    try:
                        run_screen_at(tbu, tci)
                    except Exception as e:  # Mosaic VMEM rejections
                        log(f"screen {tbu}x{tci} failed: "
                            f"{str(e).splitlines()[0][:120]}")
            else:
                run_screen_at(tb or 32, tc or 128)


if __name__ == '__main__':
    main()
