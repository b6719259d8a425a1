#!/usr/bin/env python
"""Is a ViT patch-embed conv MXU-efficient, or should it be a matmul?

The CLIP (32x32/s32) and DINOv2 (14x14/s14) patch embeddings are
non-overlapping convs over 3 input channels — the same lane-underfill
question the ResNet stem had (answered with space-to-depth,
encoders/resnet.py). For stride == kernel the exact rewrite is simpler:
extract patches by reshape/transpose and run ONE [B*N, P*P*3] x
[P*P*3, H] matmul (reduction dim 3072 / 588 — fully lane-filled).
This microbench measures whether XLA's conv lowering already does that
on the v5e or the explicit matmul is faster, to decide whether the
towers (encoders/clip.py, encoders/dinov2.py) should carry the rewrite.

Reference anchor for the towers being profiled:
/root/reference/src/models/multimodal.py:217-221 (CLIPVisionModel /
Dinov2Model patch embeddings).

Prints one JSON document on stdout.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 256
REPS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time(fn, *args):
    # fetch ONE scalar — pulling the full activation through the dev
    # tunnel would swamp compute (~650ms for 19MB, measured)
    out = fn(*args)
    _ = float(out)
    times = []
    for _i in range(REPS):
        t0 = time.time()
        _ = float(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    results = {}
    for name, (P, himg, cout) in {
            'clip_32s32': (32, 224, 768),
            'dino_14s14': (14, 224, 768)}.items():
        G = himg // P
        x = jnp.asarray(rng.standard_normal((B, himg, himg, 3)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((P, P, 3, cout)) * 0.02,
                        jnp.bfloat16)

        @jax.jit
        def conv(x, w, P=P):
            return jax.lax.conv_general_dilated(
                x, w, (P, P), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        @jax.jit
        def matmul(x, w, P=P, G=G, cout=cout):
            xp = x.reshape(B, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
            xp = xp.reshape(B, G * G, P * P * 3)
            return (xp @ w.reshape(P * P * 3, cout)).reshape(
                B, G, G, cout)

        yc = np.asarray(conv(x, w), np.float32)
        ym = np.asarray(matmul(x, w), np.float32)
        max_diff = float(np.abs(yc - ym).max())

        # The fixed ~27ms per-call dispatch (see profile_dispatch_fit.py)
        # swamps a ms-scale op, so measure the in-graph slope between 1
        # and 17 repeats; the i-dependent input scale defeats CSE.
        def repeat(op, n):
            @jax.jit
            def run(x, w):
                def body(i, acc):
                    xi = x * (1 + 1e-6 * i.astype(x.dtype))
                    return acc + jnp.sum(op(xi, w).astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return run

        def op_time(op):
            t1 = _time(repeat(op, 1), x, w)
            t17 = _time(repeat(op, 17), x, w)
            return max((t17 - t1) / 16, 1e-9)

        tc = op_time(conv)
        tm = op_time(matmul)
        gflops = 2 * B * G * G * P * P * 3 * cout / 1e9
        results[name] = {
            'conv_ms': round(tc * 1e3, 3),
            'matmul_ms': round(tm * 1e3, 3),
            'conv_tflops': round(gflops / tc / 1e3, 1),
            'matmul_tflops': round(gflops / tm / 1e3, 1),
            'speedup': round(tc / tm, 2),
            'max_abs_diff': max_diff,
        }
        log(f"{name}: conv {tc*1e3:.3f} ms ({gflops/tc/1e3:.1f} TF)  "
            f"matmul {tm*1e3:.3f} ms ({gflops/tm/1e3:.1f} TF)  "
            f"speedup {tc/tm:.2f}x  maxdiff {max_diff:.3g}")
    print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
