# pixelrec_multimodal_tpu/encoders/resnet.py
"""Flax ResNet-50 (v1.5) vision encoder.

Parity target: microsoft/resnet-50 loaded as ``AutoModel``
(/root/reference/src/models/multimodal.py:222-223). Feature semantics: the
reference consumes ``pooler_output`` — the global average pool of the final
stage, squeezed from (B, 2048, 1, 1) to (B, 2048)
(multimodal.py:418-419, 437-440).

Architecture (HF ResNetModel): 7x7/2 stem conv + BN + ReLU + 3x3/2 maxpool,
four bottleneck stages [3, 4, 6, 3] with channels [256, 512, 1024, 2048];
v1.5 places the downsampling stride on the 3x3 conv; the first stage has
stride 1. BatchNorm runs with stored running statistics (the backbone is
frozen; reference multimodal.py:230-233), so stats live in params — no
mutable state.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ResNetConfig:
    embedding_size: int = 64
    hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 2048)
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    bn_eps: float = 1e-5


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm with running stats stored as params."""
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.param('mean', nn.initializers.zeros, (self.features,))
        var = self.param('var', nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps)
        return ((x - mean) * inv * scale + bias).astype(x.dtype)


class ConvBN(nn.Module):
    """Conv -> frozen BN (-> ReLU) as HF's ResNetConvLayer."""
    features: int
    kernel: int
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        x = FrozenBatchNorm(self.features, name='bn')(x)
        return nn.relu(x) if self.act else x


class Bottleneck(nn.Module):
    """v1.5 bottleneck: 1x1 reduce -> 3x3 (stride) -> 1x1 expand + shortcut."""
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        reduced = self.out_channels // 4
        shortcut = x
        if in_channels != self.out_channels or self.stride != 1:
            shortcut = ConvBN(self.out_channels, 1, self.stride, act=False,
                              dtype=self.dtype, name='shortcut')(x)
        h = ConvBN(reduced, 1, 1, dtype=self.dtype, name='conv1')(x)
        h = ConvBN(reduced, 3, self.stride, dtype=self.dtype, name='conv2')(h)
        h = ConvBN(self.out_channels, 1, act=False, dtype=self.dtype,
                   name='conv3')(h)
        return nn.relu(h + shortcut)


class ResNetTower(nn.Module):
    """ResNet-50; pooled output = global average pool (2048)."""
    config: ResNetConfig = ResNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixel_values: (B, 3, H, W). Returns (final feature map NHWC,
        pooled (B, 2048))."""
        c = self.config
        x = pixel_values.transpose(0, 2, 3, 1)
        x = ConvBN(c.embedding_size, 7, 2, dtype=self.dtype, name='stem')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, (channels, depth) in enumerate(zip(c.hidden_sizes, c.depths)):
            stride = 1 if stage == 0 else 2
            for block in range(depth):
                x = Bottleneck(channels, stride if block == 0 else 1,
                               dtype=self.dtype,
                               name=f'stage_{stage}_block_{block}')(x)

        pooled = jnp.mean(x, axis=(1, 2))
        return x, pooled

    def pooled(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self(pixel_values)
        return pooled
