# pixelrec_multimodal_tpu/encoders/clip.py
"""Flax CLIP ViT-B/32 vision and text towers.

Parity targets: openai/clip-vit-base-patch32 loaded as ``CLIPVisionModel`` and
``CLIPTextModel`` (/root/reference/src/models/multimodal.py:217-219). Feature
semantics:

  * vision: the reference's ``_get_vision_features`` falls through to
    ``pooler_output`` — the post-layernormed CLS token, 768-dim
    (multimodal.py:414-419; CLIPVisionModel has no get_image_features).
  * text: ``pooler_output`` — final-layernormed hidden state at the EOT
    position (argmax of input ids), 512-dim (multimodal.py:484-487).

Architecture: pre-LN transformer with QuickGELU, learned class embedding and
absolute position embeddings; text side uses a causal mask.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import MultiHeadSelfAttention, causal_attention_bias, quick_gelu


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_layers: int = 12
    num_heads: int = 8
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


class CLIPEncoderLayer(nn.Module):
    """Pre-LN block with QuickGELU MLP."""
    hidden_size: int
    intermediate_size: int
    num_heads: int
    layer_norm_eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name='norm1')(x)
        x = x + MultiHeadSelfAttention(self.hidden_size, self.num_heads,
                                       dtype=self.dtype,
                                       name='attention')(h, bias)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name='norm2')(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name='fc1')(h)
        h = quick_gelu(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name='fc2')(h)
        return x + h


class _PatchEmbedding(nn.Module):
    """Non-overlapping patch embed as ONE matmul instead of a conv.

    The stride == kernel patchify conv runs 3 input channels on 128 MXU
    lanes; extracting patches by reshape/transpose and contracting over
    the fully-packed patch*patch*3 axis is the same set of products
    reassociated into an MXU-shaped GEMM — measured 1.65x on the v5e at
    the CLIP 32x32/s32 geometry (scripts/profile_patchify.py: 71.8 ->
    118.7 TFLOPS; the DINOv2 14x14/s14 geometry measured neutral, so
    dinov2.py keeps its conv). The PARAM stays the conv-layout
    [P, P, 3, H] kernel at the same tree path ('patch_embedding/kernel'):
    checkpoints and the HF converter are unaffected.
    """
    features: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] -> [B, n_patches, features]
        P = self.patch_size
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (P, P, x.shape[-1], self.features), jnp.float32)
        B, H, W, C = x.shape
        gh, gw = H // P, W // P
        xp = x.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B, gh * gw, P * P * C)
        w = kernel.reshape(P * P * C, self.features)
        return xp.astype(self.dtype) @ w.astype(self.dtype)


class CLIPVisionTower(nn.Module):
    """CLIP vision transformer; pooled output = post-LN CLS (768)."""
    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixel_values: (B, 3, H, W) normalized. Returns
        (last_hidden_state, pooler_output)."""
        c = self.config
        B = pixel_values.shape[0]
        x = pixel_values.transpose(0, 2, 3, 1)  # NHWC
        x = _PatchEmbedding(c.hidden_size, c.patch_size, dtype=self.dtype,
                            name='patch_embedding')(x)

        cls = self.param('class_embedding', nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, c.hidden_size)), x],
            axis=1)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param('position_embedding', nn.initializers.normal(0.02),
                         (n_pos, c.hidden_size))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name='pre_layrnorm')(x)

        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c.hidden_size, c.intermediate_size,
                                 c.num_heads, c.layer_norm_eps,
                                 dtype=self.dtype, name=f'layer_{i}')(x)

        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name='post_layernorm')(x[:, 0])
        return x, pooled

    def pooled(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self(pixel_values)
        return pooled


class CLIPTextTower(nn.Module):
    """CLIP text transformer; pooled output = final-LN hidden at EOT (512)."""
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        B, T = input_ids.shape
        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                     name='token_embedding')(input_ids)
        pos = self.param('position_embedding', nn.initializers.normal(0.02),
                         (c.max_position_embeddings, c.hidden_size))
        x = x + pos[None, :T]

        bias = causal_attention_bias(T)
        if attention_mask is not None:
            pad = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
            bias = bias + pad[:, None, None, :]

        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c.hidden_size, c.intermediate_size,
                                 c.num_heads, c.layer_norm_eps,
                                 dtype=self.dtype, name=f'layer_{i}')(x, bias)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name='final_layer_norm')(x)
        # EOT pooling: highest token id position (HF CLIPTextTransformer).
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        return x, pooled

    def pooled(self, input_ids, attention_mask=None) -> jnp.ndarray:
        _, pooled = self(input_ids, attention_mask)
        return pooled
