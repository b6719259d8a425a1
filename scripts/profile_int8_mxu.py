"""Probe the v5e MXU int8 rate at the pairwise-MLP scorer's shapes.

The concat fused scorer (ops/pairwise_mlp.py) is MXU-bound: 440.8M pairs/s
x 328K FLOPs/pair = 144 TFLOPS bf16, ~91% of the measured 159-TFLOPS
square-matmul peak. The v5e MXU runs int8 x int8 -> int32 at 2x the bf16
rate (394 TOPS peak), so an int8-quantized head could lift the scoring
ceiling — IF Mosaic lowers int8 ``jnp.dot`` to the native path at these
shapes. This script measures exactly that, with kernels shaped like the
production tile ([tile_users*tile_items, 512] @ [512,256] @ [256,128]):

  * bf16 chain    — the production kernel's matmul chain (baseline)
  * int8 chain    — same chain on int8 operands, int32 accumulation,
                    per-layer f32 rescale + requantize between layers
                    (the full cost a quantized kernel would pay)
  * int8 raw      — int8 dots only (no rescale), the pure MXU ceiling

Prints measured TFLOPS/TOPS per variant and the implied pairs/s ceiling.

Run on the TPU:  python scripts/profile_int8_mxu.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_call(fn, *args, reps=5):
    fn(*args)  # compile + warm
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        v = fn(*args)
        float(jnp.ravel(v)[0].astype(jnp.float32))  # fetch one scalar
        best = min(best, time.time() - t0)
    return best


TB, TC = 64, 128
ROWS = TB * TC          # 8192 activation rows per tile
H1, H2, H3 = 512, 256, 128
K = 8                   # chain length per kernel instance (amortize loads)


def bf16_chain_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    acc = jnp.zeros((ROWS, H3), jnp.float32)
    for _ in range(K):
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
        z = jnp.dot(h, w2, preferred_element_type=jnp.float32)
        acc = acc + z
        # fold the result back so iterations stay dependent (static
        # concatenate: Mosaic has no dynamic_update_slice lowering)
        x = jnp.concatenate(
            [z.astype(jnp.bfloat16), x[:, H3:]], axis=1)
    o_ref[:] = acc


def int8_chain_kernel(x_ref, w1_ref, w2_ref, o_ref, *, rescale: bool):
    x = x_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    acc = jnp.zeros((ROWS, H3), jnp.float32)
    for _ in range(K):
        h32 = jnp.dot(x, w1, preferred_element_type=jnp.int32)
        if rescale:
            # per-layer dequant -> relu -> requant (what a real quantized
            # head pays between layers)
            hf = h32.astype(jnp.float32) * (1.0 / 16384.0)
            hf = jnp.maximum(hf, 0.0)
            h8 = jnp.clip(hf * 4.0, -127, 127).astype(jnp.int8)
        else:
            h8 = (h32 >> 8).astype(jnp.int8)
        z32 = jnp.dot(h8, w2, preferred_element_type=jnp.int32)
        acc = acc + z32.astype(jnp.float32) * (1.0 / 4096.0)
        x = jnp.concatenate(
            [(z32 >> 6).astype(jnp.int8), x[:, H3:]], axis=1)
    o_ref[:] = acc


def run_variant(name, kernel, x, w1, w2, grid):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(x.shape, lambda i: (0, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS, H3), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, H3), jnp.float32),
        # The unrolled K-chain holds several [ROWS, H*] intermediates
        # live — past the 16MB scoped-VMEM default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )
    fn = jax.jit(lambda a, b, c: call(a, b, c))
    try:
        dt = _time_call(fn, x, w1, w2)
    except Exception as e:  # Mosaic may reject int8 dots outright
        log(f"{name:32s} FAILED: {str(e).splitlines()[0][:120]}")
        return None
    flops = 2 * ROWS * (H1 * H2 + H2 * H3) * K * grid
    rate = flops / dt
    log(f"{name:32s} {dt*1e3:8.2f} ms   {rate/1e12:7.2f} T(FL)OPS")
    return rate


def main():
    log(f"devices: {jax.devices()}")
    grid = 64  # kernel instances per timed call
    rng = np.random.default_rng(0)

    xb = jnp.asarray(rng.standard_normal((ROWS, H1)), jnp.bfloat16)
    w1b = jnp.asarray(rng.standard_normal((H1, H2)) * 0.05, jnp.bfloat16)
    w2b = jnp.asarray(rng.standard_normal((H2, H3)) * 0.05, jnp.bfloat16)
    bf16 = run_variant('bf16 chain (production)', bf16_chain_kernel,
                       xb, w1b, w2b, grid)

    xi = jnp.asarray(rng.integers(-127, 127, (ROWS, H1)), jnp.int8)
    w1i = jnp.asarray(rng.integers(-127, 127, (H1, H2)), jnp.int8)
    w2i = jnp.asarray(rng.integers(-127, 127, (H2, H3)), jnp.int8)
    raw = run_variant(
        'int8 chain (raw dots)',
        functools.partial(int8_chain_kernel, rescale=False),
        xi, w1i, w2i, grid)
    resc = run_variant(
        'int8 chain (+rescale/requant)',
        functools.partial(int8_chain_kernel, rescale=True),
        xi, w1i, w2i, grid)

    if bf16 and raw:
        log(f"\nint8 raw / bf16 speedup: {raw / bf16:.2f}x")
    if bf16 and resc:
        log(f"int8 rescaled / bf16 speedup: {resc / bf16:.2f}x")
        # implied headline: today's 440.8M pairs/s scales with the MXU
        # chain rate if everything else (assembly, top-k, dispatch) rode
        # along free — a CEILING, not a forecast.
        log(f"implied pairs/s ceiling: {440.8e6 * resc / bf16 / 1e6:.0f}M")


if __name__ == '__main__':
    main()
