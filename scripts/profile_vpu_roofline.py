"""Empirical VPU roofline for the attention-fusion scorer (VERDICT r2 #3).

The attention kernel (ops/attention_scorer.py) is VPU-bound: its inner loop
is ~185 array-wide [TB, TC, dp] elementwise ops per tile (the weighted-vo
broadcast-mult-accumulates, LayerNorm chains, softmax planes) against a few
MXU matmuls. Specs don't publish the v5e VPU rate, so this script MEASURES
it with Pallas microkernels shaped like the scorer's inner ops:

  * fma chain      — the multiply-accumulate pattern of the vo combines
  * exp chain      — transcendental rate (softmax exps)
  * bcast-mul-acc  — the exact [TB,TC]x[TB,TC,dp] broadcast pattern

and prints the implied pairs/s ceiling for the attention scorer's measured
op count, plus %-of-ceiling for a given measured kernel rate.

Run on the TPU:  python scripts/profile_vpu_roofline.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr)


def _time_call(fn, *args, reps=5):
    fn(*args)  # compile + warm
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        v = fn(*args)
        float(np.asarray(v).ravel()[0])  # fetch = real sync through tunnel
        best = min(best, time.time() - t0)
    return best


def fma_chain_kernel(x_ref, o_ref, *, K):
    x = x_ref[:]
    acc = x
    for _ in range(K):
        acc = acc * x + 1.0
    o_ref[:] = acc


def exp_chain_kernel(x_ref, o_ref, *, K):
    x = x_ref[:]
    acc = x
    for _ in range(K):
        acc = jnp.exp(acc * 1e-3)
    o_ref[:] = acc


def bcast_mul_acc_kernel(w_ref, v_ref, o_ref, *, K):
    """The scorer's hot pattern: [TB,TC] weights x [TC,dp] vectors
    accumulated into [TB,TC,dp]."""
    w = w_ref[:]                      # [TB, TC]
    v = v_ref[:]                      # [TC, dp]
    acc = w[:, :, None] * v[None, :, :]
    for _ in range(K - 1):
        acc = acc + w[:, :, None] * v[None, :, :]
    o_ref[:] = acc[:, :, 0]


def run_chain(kernel, shape, K, grid_rows, dtype=jnp.float32):
    from jax.experimental import pallas as pl
    x = jnp.ones(( grid_rows * shape[0], shape[1]), dtype)
    fn = pl.pallas_call(
        functools.partial(kernel, K=K),
        grid=(grid_rows,),
        in_specs=[pl.BlockSpec(shape, lambda i: (i, 0))],
        out_specs=pl.BlockSpec(shape, lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype))
    return jax.jit(fn), x


def measure_elementwise(kernel, name, K_lo=64, K_hi=256, dtype=jnp.float32):
    """Two chain lengths; the slope isolates per-op cost from memory."""
    shape, rows = (512, 128), 64
    n_elem = shape[0] * shape[1] * rows
    f_lo, x = run_chain(kernel, shape, K_lo, rows, dtype)
    f_hi, _ = run_chain(kernel, shape, K_hi, rows, dtype)
    t_lo = _time_call(f_lo, x)
    t_hi = _time_call(f_hi, x)
    rate = n_elem * (K_hi - K_lo) / max(t_hi - t_lo, 1e-9)
    log(f"  {name:14s} K={K_lo}->{K_hi}: {t_lo*1e3:.2f} -> {t_hi*1e3:.2f} ms"
        f"  => {rate/1e12:.3f} T element-ops/s")
    return rate


def measure_bcast(K_lo=16, K_hi=64):
    from jax.experimental import pallas as pl
    TB, TC, dp, rows = 8, 128, 128, 32
    w = jnp.ones((rows * TB, TC), jnp.float32)
    v = jnp.ones((TC, dp), jnp.float32)

    def build(K):
        fn = pl.pallas_call(
            functools.partial(bcast_mul_acc_kernel, K=K),
            grid=(rows,),
            in_specs=[pl.BlockSpec((TB, TC), lambda i: (i, 0)),
                      pl.BlockSpec((TC, dp), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((TB, TC), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows * TB, TC), jnp.float32))
        return jax.jit(fn)

    t_lo = _time_call(build(K_lo), w, v)
    t_hi = _time_call(build(K_hi), w, v)
    # Each iteration: one [TB,TC,dp] mul + one add (first iter mul only).
    ops = rows * TB * TC * dp * 2
    rate = ops * (K_hi - K_lo) / max(t_hi - t_lo, 1e-9)
    log(f"  bcast-mul-acc  K={K_lo}->{K_hi}: {t_lo*1e3:.2f} -> "
        f"{t_hi*1e3:.2f} ms  => {rate/1e12:.3f} T element-ops/s")
    return rate


# Array-wide op counts for one pair in ops/attention_scorer._attention_kernel
# at the flagship geometry (H=4, Mi=4, T=5, d=64, dp=128); each "heavy" op
# sweeps dp lanes per pair, each "light" op one lane. Counted from the
# kernel source (round 3):
#   u_vo broadcasts 4 + t=0 (4 heads x (5 mul + 4 add) + init/store ~9)
#   + LayerNorm 5 tokens x ~10 + fused accum 4 + t>0 16 x (3 + store 2) + 4
HEAVY_OPS = 185
LIGHT_OPS = 150
EXP_OPS = 36          # 5 planes x 4 heads (t=0) + 16 (t>0)
DP = 128


def main():
    assert jax.default_backend() == 'tpu', 'run on the TPU chip'
    log('VPU microbenchmarks (v5e):')
    fma = measure_elementwise(fma_chain_kernel, 'fma chain')
    expr = measure_elementwise(exp_chain_kernel, 'exp chain')
    bc = measure_bcast()

    # Attention ceiling: heavy ops at the bcast rate (the dominant
    # pattern), exps at the measured transcendental rate, light ops at the
    # fma rate on one lane-plane.
    per_pair = HEAVY_OPS * DP
    t_heavy = per_pair / bc
    t_exp = EXP_OPS / (expr / DP)  # exps run on [TB,TC] planes
    t_light = LIGHT_OPS / (fma / DP)
    ceiling = 1.0 / (t_heavy + t_exp + t_light)
    log(f"\nattention-scorer VPU accounting (flagship geometry):")
    log(f"  heavy [TB,TC,dp] ops/pair: {HEAVY_OPS} x {DP} lanes = "
        f"{per_pair} element-ops")
    log(f"  derived VPU ceiling: {ceiling/1e6:.1f}M pairs/s")
    measured = float(sys.argv[1]) if len(sys.argv) > 1 else 28.3e6
    log(f"  measured kernel-only rate {measured/1e6:.1f}M pairs/s = "
        f"{100*measured/ceiling:.0f}% of the VPU ceiling")
    print(jax.numpy.asarray(0))  # keep stdout clean-ish for manual runs


if __name__ == '__main__':
    main()
