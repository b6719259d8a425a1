#!/usr/bin/env python
"""Per-stage wall/FLOPs attribution for the ResNet-50 forward.

The e2e roofline (profile_e2e_roofline.py) measured the whole forward at
26% of peak and the space-to-depth stem rewrite moved the wall 0% — so
the inefficiency is NOT the stem's lane underfill. This profiler times
prefixes of the tower (stem, stem+stage0, ...) and reports per-stage
deltas with XLA-counted FLOPs, to locate which stage(s) run furthest
below peak on the v5e.

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
REPS = 8
V5E_PEAK_TFLOPS = 159.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pixelrec_multimodal_tpu.encoders.resnet import (
        Bottleneck,
        ConvBN,
        ResNetConfig,
    )

    log(f"devices: {jax.devices()}")
    c = ResNetConfig()
    dtype = jnp.bfloat16

    class Prefix(nn.Module):
        """Stem + the first ``n_stages`` bottleneck stages, summed."""
        n_stages: int
        s2d: bool = True

        @nn.compact
        def __call__(self, pixel_values):
            x = pixel_values.transpose(0, 2, 3, 1)
            x = ConvBN(c.embedding_size, 7, 2, dtype=dtype,
                       space_to_depth=self.s2d, name='stem')(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            for stage in range(self.n_stages):
                channels, depth = c.hidden_sizes[stage], c.depths[stage]
                stride = 1 if stage == 0 else 2
                for block in range(depth):
                    x = Bottleneck(channels, stride if block == 0 else 1,
                                   dtype=dtype,
                                   name=f'stage_{stage}_block_{block}')(x)
            # jnp.sum keeps everything live but fetches one scalar
            return jnp.sum(x.astype(jnp.float32))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)

    def timed(fn, *args):
        _ = float(fn(*args))
        ts = []
        for _i in range(REPS):
            t0 = time.time()
            _ = float(fn(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    results = {}
    prev_t, prev_gf = 0.0, 0.0
    names = ['stem+pool', 'stage0', 'stage1', 'stage2', 'stage3']
    for n in range(0, 5):
        mod = Prefix(n_stages=n)
        params = mod.init(jax.random.PRNGKey(0), images[:2])
        fwd = jax.jit(lambda p, x, mod=mod: mod.apply(p, x))
        try:
            ca = fwd.lower(params, images).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            gf = float(ca['flops']) / 1e9
        except Exception:
            gf = 0.0
        t = timed(fwd, params, images)
        dt, dgf = t - prev_t, gf - prev_gf
        tf = dgf / dt / 1e3 if dt > 0 else 0.0
        results[names[n]] = {
            'cum_ms': round(t * 1e3, 2),
            'delta_ms': round(dt * 1e3, 2),
            'delta_gflops': round(dgf, 1),
            'delta_tflops': round(tf, 1),
            'pct_peak': round(100 * tf / V5E_PEAK_TFLOPS, 1),
        }
        log(f"{names[n]:<10} cum {t*1e3:7.2f} ms  delta {dt*1e3:7.2f} ms "
            f"{dgf:7.1f} GF  {tf:6.1f} TF ({100*tf/V5E_PEAK_TFLOPS:.0f}%)")
        prev_t, prev_gf = t, gf
    print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
