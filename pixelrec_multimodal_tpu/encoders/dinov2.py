# pixelrec_multimodal_tpu/encoders/dinov2.py
"""Flax DINOv2 ViT-B/14 vision encoder.

Parity target: facebook/dinov2-base loaded as ``Dinov2Model``
(/root/reference/src/models/multimodal.py:220-221). HF semantics: pooled
output = layernormed CLS token (768) — which is what the reference's
``pooler_output`` branch consumes (multimodal.py:418-419).

Architecture: patch-14 ViT, pre-LN blocks with LayerScale, standard MLP (base
model: use_swiglu_ffn=False). Position embeddings are stored for the 518-px
training grid (37x37 patches) and bicubic-interpolated to the input grid —
needed because the pipeline feeds 224-px crops (16x16 patches).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import MultiHeadSelfAttention


def _cubic_kernel(x: "np.ndarray", a: float = -0.75):
    import numpy as np
    x = np.abs(x)
    return np.where(
        x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
        np.where(x < 2, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a, 0.0))


def bicubic_resize_matrix(src: int, dst: int) -> jnp.ndarray:
    """[dst, src] interpolation matrix reproducing torch bicubic
    (align_corners=False, a=-0.75, edge-clamped) exactly — the convention HF
    Dinov2 uses for position-embedding interpolation. jax.image.resize's
    'bicubic' is Catmull-Rom (a=-0.5) and does NOT match. src/dst are static
    (patch-grid sizes), so the matrix is a compile-time constant and the
    interpolation compiles to two small matmuls."""
    import numpy as np
    M = np.zeros((dst, src), np.float64)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(x))
        t = x - i0
        for off in (-1, 0, 1, 2):
            idx = min(max(i0 + off, 0), src - 1)
            M[i, idx] += _cubic_kernel(np.asarray(off - t))
    return jnp.asarray(M, jnp.float32)


@dataclass(frozen=True)
class Dinov2Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 14
    # The grid size the stored position embeddings correspond to (518/14).
    pos_embed_grid: int = 37
    layer_norm_eps: float = 1e-6
    layerscale_init: float = 1.0


class Dinov2Layer(nn.Module):
    config: Dinov2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name='norm1')(x)
        h = MultiHeadSelfAttention(c.hidden_size, c.num_heads,
                                   dtype=self.dtype, name='attention')(h)
        ls1 = self.param('layerscale1',
                         nn.initializers.constant(c.layerscale_init),
                         (c.hidden_size,))
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name='norm2')(x)
        h = nn.Dense(c.hidden_size * c.mlp_ratio, dtype=self.dtype,
                     name='fc1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name='fc2')(h)
        ls2 = self.param('layerscale2',
                         nn.initializers.constant(c.layerscale_init),
                         (c.hidden_size,))
        return x + h * ls2


class Dinov2Tower(nn.Module):
    """DINOv2 encoder; pooled output = layernormed CLS (768)."""
    config: Dinov2Config = Dinov2Config()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        B, _, H, W = pixel_values.shape
        gh, gw = H // c.patch_size, W // c.patch_size

        x = pixel_values.transpose(0, 2, 3, 1)
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), dtype=self.dtype,
                    name='patch_embedding')(x)
        x = x.reshape(B, gh * gw, c.hidden_size)

        cls = self.param('cls_token', nn.initializers.normal(0.02),
                         (1, 1, c.hidden_size))
        pos = self.param('position_embeddings', nn.initializers.normal(0.02),
                         (1, c.pos_embed_grid * c.pos_embed_grid + 1,
                          c.hidden_size))
        # Interpolate patch position embeddings to the input grid (HF
        # interpolate_pos_encoding), keeping the CLS slot as-is.
        cls_pos = pos[:, :1]
        patch_pos = pos[:, 1:].reshape(
            1, c.pos_embed_grid, c.pos_embed_grid, c.hidden_size)
        if (gh, gw) != (c.pos_embed_grid, c.pos_embed_grid):
            # torch-convention bicubic (matches HF interpolate_pos_encoding
            # bit-for-bit; see bicubic_resize_matrix).
            Mh = bicubic_resize_matrix(c.pos_embed_grid, gh)
            Mw = bicubic_resize_matrix(c.pos_embed_grid, gw)
            patch_pos = jnp.einsum('oh,bhwd,pw->bopd', Mh, patch_pos, Mw)
        patch_pos = patch_pos.reshape(1, gh * gw, c.hidden_size)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.hidden_size)), x], axis=1)
        x = x + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(x.dtype)

        for i in range(c.num_layers):
            x = Dinov2Layer(c, dtype=self.dtype, name=f'layer_{i}')(x)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name='layernorm')(x)
        return x, x[:, 0]

    def pooled(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self(pixel_values)
        return pooled
