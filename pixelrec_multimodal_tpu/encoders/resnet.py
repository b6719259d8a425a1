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


class _S2DStemConv(nn.Module):
    """The 7x7/s2 stem conv evaluated as a 4x4/s1 conv on space-to-depth
    packed input — the classic TPU ResNet transform.

    The canonical [7, 7, 3, F] kernel is underfilled on the MXU: 3 input
    channels on 128 lanes gives the implicit GEMM a reduction dim of
    7*7*3 = 147 at ~2% lane occupancy, and the measured e2e roofline
    decomposition (BASELINE.md round 4) put the whole ResNet-50 forward at
    26% of peak with the stem as the named lever. Packing each 2x2 input
    block into channels ([B, H, W, 3] -> [B, H/2, W/2, 12]) turns the
    stride-2 7x7 into a stride-1 4x4 over 12 channels: output row ``oh``
    of the original conv reads input rows ``2*oh + kh - 3`` (kh in 0..6);
    writing ``2*oh + kh - 3 = 2*p + dh`` gives packed rows
    ``p - oh in {-2,-1,0,1}`` — 4 taps, pad (2, 1). The packed kernel is
    the canonical one zero-padded to 8x8 at the leading edge (the
    ``kh = -1`` tap never existed) and regrouped, so the computation is
    mathematically identical — extra taps carry exactly-zero weights.

    The PARAM stays the canonical [7, 7, 3, F] kernel at the same tree
    path ('conv/kernel'): checkpoints, HF converters, and freeze masks are
    unaffected, and gradients flow through the (linear) regrouping.
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features), jnp.float32)
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        z = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        z = z.reshape(4, 2, 4, 2, 3, self.features)
        w = z.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.features)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class ConvBN(nn.Module):
    """Conv -> frozen BN (-> ReLU) as HF's ResNetConvLayer."""
    features: int
    kernel: int
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x):
        if self.space_to_depth:
            x = _S2DStemConv(self.features, dtype=self.dtype,
                             name='conv')(x)
        else:
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
        # Space-to-depth stem whenever the spatial dims allow the 2x2
        # packing (any production 224px input does); equivalence with the
        # canonical stem is unit-tested, params are identical either way.
        s2d = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        x = ConvBN(c.embedding_size, 7, 2, dtype=self.dtype,
                   space_to_depth=s2d, name='stem')(x)
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
