# pixelrec_multimodal_tpu/encoders/convnext.py
"""Flax ConvNeXt-Base vision encoder.

Parity target: facebook/convnext-base-224 loaded as ``AutoModel``
(/root/reference/src/models/multimodal.py:222-223). Feature semantics: the
reference consumes ``pooler_output`` — LayerNorm over the globally mean-pooled
final feature map, 1024-dim (HF ConvNextModel).

Architecture: 4x4/4 patchify stem + LN, four stages with depths [3,3,27,3]
and widths [128,256,512,1024]; between stages an LN + 2x2/2 conv downsample.
Block: 7x7 depthwise conv -> LN (channels-last) -> 1x1 expand (4x) -> GELU ->
1x1 project -> layer-scale residual.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class ConvNextConfig:
    hidden_sizes: Tuple[int, ...] = (128, 256, 512, 1024)
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    patch_size: int = 4
    layer_norm_eps: float = 1e-12
    layer_scale_init: float = 1e-6
    # HF applies LayerNorm inside blocks/stems with eps 1e-6.
    block_ln_eps: float = 1e-6


class ConvNextBlock(nn.Module):
    dim: int
    layer_scale_init: float
    ln_eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    name='dwconv')(x)
        h = nn.LayerNorm(epsilon=self.ln_eps, name='norm')(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name='pwconv1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name='pwconv2')(h)
        gamma = self.param('layer_scale',
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + h * gamma


class ConvNextTower(nn.Module):
    """ConvNeXt-Base; pooled output = LN(global mean pool) (1024)."""
    config: ConvNextConfig = ConvNextConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        x = pixel_values.transpose(0, 2, 3, 1)
        x = nn.Conv(c.hidden_sizes[0], (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), dtype=self.dtype,
                    name='stem_conv')(x)
        x = nn.LayerNorm(epsilon=c.block_ln_eps, name='stem_norm')(x)

        for stage, (dim, depth) in enumerate(zip(c.hidden_sizes, c.depths)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=c.block_ln_eps,
                                 name=f'downsample_norm_{stage}')(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f'downsample_conv_{stage}')(x)
            for block in range(depth):
                x = ConvNextBlock(dim, c.layer_scale_init, c.block_ln_eps,
                                  dtype=self.dtype,
                                  name=f'stage_{stage}_block_{block}')(x)

        pooled = jnp.mean(x, axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name='final_layernorm')(pooled)
        return x, pooled

    def pooled(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self(pixel_values)
        return pooled
