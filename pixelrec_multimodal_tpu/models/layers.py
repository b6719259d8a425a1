# pixelrec_multimodal_tpu/models/layers.py
"""Fusion layers and attention blocks (Flax).

Parity targets: /root/reference/src/models/layers.py — CrossModalAttention
(:15-101), AttentionFusionLayer (:104-164), GatedFusionLayer (:167-225).
All three operate on stacked modality embeddings with static shapes; the
modality count is a compile-time constant, so each configuration compiles to
one fused XLA graph.
"""
from __future__ import annotations

import math
from typing import Optional

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class CrossModalAttention(nn.Module):
    """Single-head scaled dot-product attention: vision queries text.

    Accepts pooled (B, D) or token-level (B, T, D) features; output shape
    follows the query. Library component — like the reference (:15-101), it is
    not wired into the recommender itself.
    """
    dim: int

    @nn.compact
    def __call__(self, vision_features: jnp.ndarray,
                 text_features: jnp.ndarray) -> jnp.ndarray:
        q = nn.Dense(self.dim, name='query_projection')(vision_features)
        k = nn.Dense(self.dim, name='key_projection')(text_features)
        v = nn.Dense(self.dim, name='value_projection')(text_features)

        squeeze_out = q.ndim == 2
        if q.ndim == 2:
            q = q[:, None, :]
        if k.ndim == 2:
            k = k[:, None, :]
        if v.ndim == 2:
            v = v[:, None, :]

        scores = jnp.einsum('bqd,bkd->bqk', q, k) / math.sqrt(self.dim)
        weights = nn.softmax(scores, axis=-1)
        out = jnp.einsum('bqk,bkd->bqd', weights, v)
        if squeeze_out and out.shape[1] == 1:
            out = out[:, 0, :]
        return out


class AttentionFusionLayer(nn.Module):
    """Self-attention fusion over the modality axis.

    Modalities form a short sequence (3-6 tokens); multi-head self-attention +
    residual + LayerNorm, then mean-pool over modalities (reference :104-164).
    """
    embedding_dim: int
    num_attention_heads: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, *, train: bool = False
                 ) -> jnp.ndarray:
        """features: (B, num_modalities, D) -> (B, D)."""
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_attention_heads,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
            dtype=self.dtype,
            name='attention')(features, features)
        x = features + nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        x = nn.LayerNorm(name='norm')(x)
        return jnp.mean(x, axis=1)


class GatedFusionLayer(nn.Module):
    """Softmax-gated weighted sum of modalities (reference :167-225)."""
    embedding_dim: int
    num_modalities: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, *, train: bool = False
                 ) -> jnp.ndarray:
        """features: (B, num_modalities, D) -> (B, D)."""
        b = features.shape[0]
        concat = features.reshape(b, self.num_modalities * self.embedding_dim)
        concat = nn.Dropout(self.dropout_rate, deterministic=not train)(concat)
        gates = nn.Dense(self.num_modalities, dtype=self.dtype,
                         name='gating')(concat)
        gates = nn.softmax(gates, axis=-1)
        return jnp.sum(features * gates[:, :, None], axis=1)
