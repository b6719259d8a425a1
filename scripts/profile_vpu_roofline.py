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
    import jax.numpy as jnp
    fn(*args)  # compile + warm
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        v = fn(*args)
        # Fetch ONE scalar (a full-array fetch through the tunnel would
        # dominate the measurement at ~150 MB/s).
        float(jnp.ravel(v)[0])
        best = min(best, time.time() - t0)
    return best


def fma_chain_kernel(x_ref, o_ref, *, K):
    # Two interleaved chains: enough ILP that the VPU pipeline stays full
    # (a single serial chain measures latency, not throughput).
    x = x_ref[:]
    a = x
    b = x + 0.5
    for _ in range(K // 2):
        a = a * x + 1.0
        b = b * x + 2.0
    o_ref[:] = a + b


def exp_chain_kernel(x_ref, o_ref, *, K):
    x = x_ref[:]
    a = x
    b = x * 0.5
    for _ in range(K // 2):
        a = a + jnp.exp(x - a * 1e-6)
        b = b + jnp.exp(x - b * 1e-6)
    o_ref[:] = a + b


def bcast_mul_acc_kernel(w_ref, v_ref, o_ref, *, K):
    """The scorer's hot pattern: [TB,TC] weights x [TC,dp] vectors
    accumulated into [TB,TC,dp]. The weight of each iteration is derived
    from the accumulator (as in the real kernel, where softmax weights
    depend on computed logits) — also prevents constant-folding the loop
    into a single multiply-by-K."""
    w = w_ref[:]                      # [TB, TC]
    v = v_ref[:]                      # [TC, dp]
    acc = w[:, :, None] * v[None, :, :]
    for _ in range(K - 1):
        s = acc[:, :, 0] * 1e-6 + 1.0   # [TB,TC] weight from prior state
        acc = acc + s[:, :, None] * v[None, :, :]
    o_ref[:] = acc[:, :, 0]


def run_chain(kernel, shape, K, grid_steps, dtype=jnp.float32):
    """Grid loops over the SAME block: total work = grid_steps x block x K
    with negligible memory traffic, so kernel time dwarfs the ~31ms tunnel
    dispatch (the previous per-row-grid design measured dispatch noise)."""
    from jax.experimental import pallas as pl
    x = jnp.ones(shape, dtype)
    fn = pl.pallas_call(
        functools.partial(kernel, K=K),
        grid=(grid_steps,),
        in_specs=[pl.BlockSpec(shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec(shape, lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype))
    return jax.jit(fn), x


def measure_elementwise(kernel, name, K_lo=64, K_hi=192, steps=8192,
                        dtype=jnp.float32):
    """Two chain lengths; the slope isolates per-op cost."""
    shape = (512, 128)
    n_elem = shape[0] * shape[1] * steps
    f_lo, x = run_chain(kernel, shape, K_lo, steps, dtype)
    f_hi, _ = run_chain(kernel, shape, K_hi, steps, dtype)
    t_lo = _time_call(f_lo, x)
    t_hi = _time_call(f_hi, x)
    rate = n_elem * (K_hi - K_lo) / max(t_hi - t_lo, 1e-9)
    log(f"  {name:14s} K={K_lo}->{K_hi}: {t_lo*1e3:.2f} -> {t_hi*1e3:.2f} ms"
        f"  => {rate/1e12:.3f} T element-ops/s")
    return rate


def measure_bcast(K_lo=16, K_hi=48, steps=8192):
    from jax.experimental import pallas as pl
    TB, TC, dp = 8, 128, 128
    w = jnp.ones((TB, TC), jnp.float32)
    v = jnp.ones((TC, dp), jnp.float32)

    def build(K):
        fn = pl.pallas_call(
            functools.partial(bcast_mul_acc_kernel, K=K),
            grid=(steps,),
            in_specs=[pl.BlockSpec((TB, TC), lambda i: (0, 0)),
                      pl.BlockSpec((TC, dp), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((TB, TC), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((TB, TC), jnp.float32))
        return jax.jit(fn)

    t_lo = _time_call(build(K_lo), w, v)
    t_hi = _time_call(build(K_hi), w, v)
    # Each iteration: one [TB,TC,dp] mul + one add (first iter mul only).
    ops = steps * TB * TC * dp * 2
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
    only = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].replace('.', '').isdigit() else None
    log('VPU microbenchmarks (v5e):')
    if only == 'bcast':
        measure_bcast()
        return
    if only == 'bf16':
        # Does the VPU pack bf16 at 2 lanes/cycle? If yes, casting the
        # heavy accumulation to bf16 would double the attention ceiling.
        measure_elementwise(fma_chain_kernel, 'fma f32')
        measure_elementwise(fma_chain_kernel, 'fma bf16',
                            dtype=jnp.bfloat16)
        return
    fma = measure_elementwise(fma_chain_kernel, 'fma chain')
    expr = measure_elementwise(exp_chain_kernel, 'exp chain')
    bc = measure_bcast()

    # Attention ceiling: heavy ops at the bcast rate (the dominant
    # pattern); light/exp ops run on [TB,TC] planes = 1 lane-row per pair,
    # so their per-pair element counts are LIGHT_OPS and EXP_OPS directly.
    per_pair = HEAVY_OPS * DP
    t_heavy = per_pair / bc
    t_exp = EXP_OPS / expr
    t_light = LIGHT_OPS / fma
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
